"""Serve a distilled DMD2-M one-step student over HTTP.

The companion of `ccdm_tpu.serve` (which serves the DDIM teacher): loads a
`dmd-<milestone>` checkpoint's generator + the teacher's label embedding and
answers /generate with ONE netG forward per request — the latency profile
the distillation exists for (ref dmd.py:900-940; bench:
`dmd_onestep_img_s`).

    python -m ccdm_tpu.serve_dmd --root_path <run root> --data_name RC-49 \
        --serve_milestone 50000 --gan_arch sngan --gene_ch 84 --dim_z 256 \
        --y2h_embed_type resnet --serve_port 8601

Same API and operational contract as `ccdm_tpu.serve`; `cond_scale` in a
request is a 400 (no CFG pass exists for a one-step generator).
"""

from __future__ import annotations

import os


def main(argv=None):
    from ccdm_tpu.dmd_main import parse_opts_dmd
    from ccdm_tpu.serve import GeneratorService, serve
    from ccdm_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    args = parse_opts_dmd(argv)
    args.results_folder = os.path.join(
        args.root_path, "output", f"{args.data_name}_{args.image_size}",
        args.setting_name, "results")
    service = GeneratorService(args, max_batch=args.samp_batch_size,
                               max_labels=args.serve_max_labels)
    serve(service, args.serve_port, host=args.serve_host)


if __name__ == "__main__":
    main()
