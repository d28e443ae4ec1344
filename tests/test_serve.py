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
