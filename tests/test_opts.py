"""Flag-surface integrity (VERDICT round-3 'next' #4): every parsed flag is
either consumed somewhere in the package or listed in the documented
INERT_FLAGS registry — the parsed-but-dead class of defect (ref flags that
main.py never forwarded, e.g. --adaptive_slicing in rounds 2-3) cannot
reappear silently.

Plus behavior tests for the flags wired this round: --net_embed depth
selection and --resumeepoch_cnn_embed in-train embed-checkpoint resume
(ref label_embedding.py:1339-1347).
"""

import os

import numpy as np
import pytest


def _all_package_source() -> str:
    import ccdm_tpu

    pkg_root = os.path.dirname(ccdm_tpu.__file__)
    repo_root = os.path.dirname(pkg_root)
    chunks = []
    for root, _, files in os.walk(pkg_root):
        for f in files:
            if f.endswith(".py") and f != "opts.py":
                with open(os.path.join(root, f)) as fh:
                    chunks.append(fh.read())
    for extra in ("__graft_entry__.py", "bench.py"):
        p = os.path.join(repo_root, extra)
        if os.path.exists(p):
            with open(p) as fh:
                chunks.append(fh.read())
    return "\n".join(chunks)


def test_every_flag_consumed_or_documented_inert():
    from ccdm_tpu.opts import INERT_FLAGS, parse_opts

    args = parse_opts([])
    source = _all_package_source()
    dead = []
    for dest in vars(args):
        if dest in INERT_FLAGS:
            continue
        # consumed = referenced as args.<dest> or by name via getattr/string
        if (f"args.{dest}" not in source and f'"{dest}"' not in source
                and f"'{dest}'" not in source):
            dead.append(dest)
    assert not dead, (
        f"parsed-but-dead flags {dead}: wire them or add them to "
        f"ccdm_tpu.opts.INERT_FLAGS with a reason"
    )


def test_inert_flags_are_actually_parsed_and_documented():
    from ccdm_tpu.opts import INERT_FLAGS, parse_opts

    args = parse_opts([])
    for dest, reason in INERT_FLAGS.items():
        assert hasattr(args, dest), f"INERT_FLAGS lists unknown flag {dest}"
        assert len(reason) > 20, f"INERT_FLAGS[{dest}] needs a real reason"


# ----------------------------------------------------------- new wirings


def _tiny_embed_data(n=24, size=8):
    rng = np.random.default_rng(0)
    labels = rng.uniform(0.1, 0.9, n).astype(np.float32)
    images = (labels[:, None, None, None] * 255
              + rng.normal(0, 10, (n, size, size, 1))).clip(0, 255).astype(np.uint8)
    return images, labels


def test_net_embed_depth_selection():
    from ccdm_tpu.embedding.ili import NET_EMBED_BLOCKS, _embed_blocks

    assert _embed_blocks("ResNet34_embed") == (3, 4, 6, 3)
    assert _embed_blocks("ResNet18_embed") == (2, 2, 2, 2)
    assert _embed_blocks("ResNet18_embed_y2cov") == (2, 2, 2, 2)
    with pytest.raises(SystemExit, match="unknown --net_embed"):
        _embed_blocks("ResNet50_embed")
    assert set(NET_EMBED_BLOCKS) == {"ResNet18_embed", "ResNet34_embed"}


def test_embed_pretrain_checkpoint_resume(tmp_path):
    """Interrupt-and-resume must land on the SAME trajectory as an
    uninterrupted run: the PRNG stream is folded from (epoch, step) and the
    checkpoint carries params+batch_stats+opt_state."""
    import jax

    from ccdm_tpu.embedding.ili import train_resnet_embed

    images, labels = _tiny_embed_data()
    kw = dict(dim_embed=16, epochs=4, batch_size=8, seed=3,
              num_blocks=(1, 1, 1, 1), log_every=0, ckpt_every=2)

    full = train_resnet_embed(images, labels, ckpt_dir=None, **kw)

    ckpt_dir = str(tmp_path / "embed_models")
    train_resnet_embed(images, labels, ckpt_dir=ckpt_dir, ckpt_tag="t", **kw)
    assert os.path.isdir(os.path.join(ckpt_dir, "model-t_epoch2")), \
        "in-train embed checkpoint not written"

    resumed = train_resnet_embed(images, labels, ckpt_dir=ckpt_dir,
                                 ckpt_tag="t", resume_epoch=2, **kw)
    for a, b in zip(jax.tree_util.tree_leaves(full["params"]),
                    jax.tree_util.tree_leaves(resumed["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_embed_resume_missing_checkpoint_raises(tmp_path):
    from ccdm_tpu.embedding.ili import train_resnet_embed

    images, labels = _tiny_embed_data()
    with pytest.raises(FileNotFoundError, match="no in-train embed checkpoint"):
        train_resnet_embed(images, labels, dim_embed=16, epochs=4,
                           batch_size=8, num_blocks=(1, 1, 1, 1),
                           ckpt_dir=str(tmp_path), ckpt_tag="t",
                           resume_epoch=2, log_every=0)


def test_adaptive_slicing_reaches_trainer(tmp_path):
    """--adaptive_slicing must reach TrainerConfig through the CLI (the
    round-3 gap: parsed + implemented but never forwarded, main.py:210-234)."""
    from ccdm_tpu import main as cli

    cli.main([
        "--root_path", str(tmp_path), "--data_name", "synthetic",
        "--image_size", "16", "--num_channels", "1",
        "--min_label", "0", "--max_label", "1",
        "--model_channels", "8", "--channel_mult", "1_2",
        "--train_timesteps", "20", "--niters", "2", "--train_batch_size", "8",
        "--sample_every", "1000000", "--save_every", "1000000",
        "--sampler", "ddim", "--sample_timesteps", "2",
        "--nfake_per_label", "2", "--samp_batch_size", "2",
        "--adaptive_slicing", "--hyperparameter", "percentile",
        "--vicinity_type", "hv",
    ])
    log = os.path.join(str(tmp_path), "output", "synthetic_16", "Setup1",
                       "results", "train_log.jsonl")
    assert os.path.exists(log)
