"""Inference serving (ccdm_tpu/serve.py): service semantics + HTTP API."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from ccdm_tpu.opts import parse_opts
from ccdm_tpu.serve import SamplerService, make_handler


def _tiny_args(tmp_path, milestone=0):
    args = parse_opts([
        "--root_path", str(tmp_path), "--data_name", "synthetic",
        "--image_size", "16", "--model_channels", "8", "--channel_mult", "1_2",
        "--train_timesteps", "20", "--sample_timesteps", "2",
        "--num_channels", "1", "--samp_batch_size", "4",
        "--serve_milestone", str(milestone),
    ])
    args.results_folder = str(tmp_path / "results")
    return args


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    args = _tiny_args(tmp_path_factory.mktemp("serve"))
    return SamplerService(args, max_batch=4, warm=True)


def test_generate_shapes_and_padding(service):
    """Requests below/above the compiled batch pad and slice correctly."""
    out = service.generate(np.array([0.2, 0.8], np.float32))
    assert out.shape == (2, 16, 16, 1) and out.dtype == np.uint8
    out6 = service.generate(np.linspace(0.1, 0.9, 6).astype(np.float32))
    assert out6.shape == (6, 16, 16, 1)


def test_generate_seed_determinism(service):
    a = service.generate(np.array([0.5], np.float32), seed=7)
    b = service.generate(np.array([0.5], np.float32), seed=7)
    c = service.generate(np.array([0.5], np.float32), seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_generate_rejects_bad_labels(service):
    with pytest.raises(ValueError):
        service.generate(np.array([1.5], np.float32))
    with pytest.raises(ValueError):
        service.generate(np.zeros((0,), np.float32))


def test_missing_milestone_raises(tmp_path):
    args = _tiny_args(tmp_path, milestone=999)
    with pytest.raises(FileNotFoundError):
        SamplerService(args, warm=False)


def test_http_roundtrip(service):
    """Real HTTP: healthz + generate through a live ThreadingHTTPServer."""
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["warm"] is True

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"labels": [0.25, 0.75], "seed": 3}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = json.loads(r.read())
        images = np.load(io.BytesIO(base64.b64decode(payload["images_b64"])))["images"]
        assert images.shape == (2, 16, 16, 1) and images.dtype == np.uint8
        assert payload["labels"] == [0.25, 0.75]

        # malformed request -> 400 with an error message, server stays up
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"labels": [2.0]}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()


# ------------------------- one-step DMD student serving (serve_dmd) -------

def _dmd_args(tmp_path, milestone=5):
    from ccdm_tpu.dmd_main import parse_opts_dmd

    args = parse_opts_dmd([
        "--root_path", str(tmp_path), "--data_name", "synthetic",
        "--image_size", "64", "--num_channels", "1",
        "--gan_arch", "sngan", "--gene_ch", "4", "--dim_z", "8",
        "--y2h_embed_type", "sinusoidal", "--samp_batch_size", "4",
        "--serve_milestone", str(milestone),
    ])
    args.results_folder = str(tmp_path / "results")
    return args


@pytest.fixture(scope="module")
def dmd_service(tmp_path_factory):
    """Save a tiny netG as a dmd checkpoint, then serve it."""
    import jax
    import jax.numpy as jnp

    from ccdm_tpu.models.sngan import SNGANGenerator
    from ccdm_tpu.serve import GeneratorService
    from ccdm_tpu.utils.ckpt import save_checkpoint

    tmp = tmp_path_factory.mktemp("serve_dmd")
    args = _dmd_args(tmp)
    netG = SNGANGenerator(dim_z=8, dim_embed=128, nc=1, img_size=64, gene_ch=4)
    gv = netG.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)),
                   jnp.zeros((2, 128)), train=False)
    save_checkpoint(args.results_folder, "dmd-5", {
        "gen_params": jax.device_get(gv["params"]),
        "gen_stats": jax.device_get(gv.get("batch_stats", {})),
    })
    return GeneratorService(args, max_batch=4, warm=True)


def test_dmd_service_one_step_generate(dmd_service):
    out = dmd_service.generate(np.array([0.2, 0.8, 0.5], np.float32), seed=3)
    assert out.shape == (3, 64, 64, 1) and out.dtype == np.uint8
    # deterministic per seed, different across seeds
    a = dmd_service.generate(np.array([0.5], np.float32), seed=7)
    b = dmd_service.generate(np.array([0.5], np.float32), seed=7)
    c = dmd_service.generate(np.array([0.5], np.float32), seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_dmd_service_rejects_cond_scale_and_missing_ckpt(dmd_service, tmp_path):
    from ccdm_tpu.serve import GeneratorService

    with pytest.raises(ValueError, match="cond_scale"):
        dmd_service.generate(np.array([0.5], np.float32), cond_scale=2.0)
    with pytest.raises(FileNotFoundError):
        GeneratorService(_dmd_args(tmp_path, milestone=99), warm=False)


def test_dmd_service_http_roundtrip(dmd_service):
    """The shared HTTP handler serves the one-step student; cond_scale -> 400."""
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(dmd_service))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"labels": [0.25], "seed": 1}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = json.loads(r.read())
        images = np.load(io.BytesIO(base64.b64decode(payload["images_b64"])))["images"]
        assert images.shape == (1, 64, 64, 1)

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"labels": [0.5], "cond_scale": 2.0}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
