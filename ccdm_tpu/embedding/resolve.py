"""Single construction seam for label embeddings across every entry point.

The reference builds its `LabelEmbed` (trained resnet ILI y2h + y2cov) the
same way in BOTH `main.py:303-338` and `dmd.py:104-146` — the distillation
MUST condition through the same embedding space the teacher was trained in.
Round 2 of this repo only wired that construction inside `main.py`, leaving
`dmd_main.py` and `serve.py` able to build analytic embeddings only (a
correctness bug: distillation/serving of a resnet-ILI teacher silently used
sinusoidal conditioning, or crashed when `resnet` was requested).

`build_label_embedding` is now the one place that maps
(`--y2h_embed_type`, `--y2cov_embed_type`, `--use_Hy`) to `(fn_y2h,
fn_y2cov)`:

- analytic types (sinusoidal / gaussian) -> pure functions, no state;
- `resnet` -> the trained ILI pipeline under `<setting_folder>/embed_models`,
  train-or-load when a dataset bundle is given, strict load-only (clear
  `FileNotFoundError`) when not — serving never trains.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

from ccdm_tpu.embedding.analytic import make_fn_y2h, make_fn_y2cov


def build_label_embedding(
    args,
    setting_folder: str,
    bundle=None,
    require_cached: bool = False,
) -> Tuple[Callable, Optional[Callable]]:
    """Resolve (fn_y2h, fn_y2cov-or-None) from the CLI surface.

    ``args`` needs: dim_embed, y2h_embed_type, y2cov_embed_type, use_Hy,
    image_size, num_channels; the embed-training hyperparameters
    (epoch_cnn_embed, epoch_net_y2h, batch_size_embed, seed, dim_combination)
    are read with the reference's defaults when the caller's parser lacks
    them. ``setting_folder`` hosts/holds ``embed_models`` — for DMD and
    serving this must be the TEACHER's setting folder.
    """
    label_dim = bundle.label_dim if bundle is not None else getattr(args, "label_dim", 1)
    channels = bundle.channels if bundle is not None else args.num_channels
    image_size = bundle.image_size if bundle is not None else args.image_size
    cov_dim = channels * image_size**2
    use_Hy = bool(getattr(args, "use_Hy", False))
    y2h_type = args.y2h_embed_type
    y2cov_type = getattr(args, "y2cov_embed_type", "sinusoidal")
    dim_comb = getattr(args, "dim_combination", "mean")

    if y2h_type != "resnet" and use_Hy and y2cov_type == "resnet":
        raise SystemExit(
            "--y2cov_embed_type resnet requires --y2h_embed_type resnet "
            "(the trained ILI pipeline provides both heads; ref "
            "label_embedding.py:212)"
        )

    if y2h_type == "resnet":
        from ccdm_tpu.embedding.ili import LabelEmbed

        le = LabelEmbed(
            bundle, setting_folder,
            dim_embed=args.dim_embed,
            y2h_type="resnet",
            y2cov_type=y2cov_type if use_Hy else None,
            cov_dim=cov_dim,
            epochs_cnn=getattr(args, "epoch_cnn_embed", 200),
            epochs_mlp=getattr(args, "epoch_net_y2h", 500),
            epochs_cnn_y2cov=getattr(args, "epoch_cnn_embed_y2cov", 10),
            net_embed=getattr(args, "net_embed", "ResNet34_embed"),
            net_embed_y2cov=getattr(args, "net_embed_y2cov", "ResNet34_embed_y2cov"),
            batch_size_y2cov=getattr(args, "batch_size_embed_y2cov", None),
            resume_epoch_cnn=getattr(args, "resumeepoch_cnn_embed", 0),
            resume_epoch_cnn_y2cov=getattr(args, "resumeepoch_cnn_embed_y2cov", 0),
            epochs_mlp_y2cov=getattr(args, "epoch_net_y2cov", 500),
            batch_size=getattr(args, "batch_size_embed", 256),
            seed=getattr(args, "seed", 111),
            dim_combination=dim_comb,
            require_cached=require_cached,
            label_dim=label_dim,
        )
        return le.fn_y2h, (le.fn_y2cov if use_Hy else None)

    fn_y2h = make_fn_y2h(args.dim_embed, y2h_type, label_dim,
                         dim_combination=dim_comb)
    fn_y2cov = (
        make_fn_y2cov(cov_dim, y2cov_type, label_dim, dim_combination=dim_comb)
        if use_Hy else None
    )
    return fn_y2h, fn_y2cov
