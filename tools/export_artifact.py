"""Export a trained run as an AOT serving artifact (mmbidaf_tpu.export).

    python tools/export_artifact.py --run_dir runs/mmbidaf-01 --out artifact/
    python tools/export_artifact.py --run_dir ... --out ... --platforms tpu
    python tools/export_artifact.py --random --vgg tiny --out artifact/  # smoke

The artifact directory then serves WITHOUT the model-building code:

    from mmbidaf_tpu.export import ExportedSummarizer
    print(ExportedSummarizer("artifact/").summarize(video_dir))

``--verify`` reloads the artifact in-process and checks its picks against
the live Summarizer on a zero batch before reporting success.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--run_dir", help="train.py run directory (ckpts + vocab)")
    src.add_argument("--random", action="store_true",
                     help="untrained random weights (smoke/demo)")
    ap.add_argument("--out", required=True, help="artifact output directory")
    ap.add_argument("--batch", type=int, default=1,
                    help="static serving batch size baked into the program")
    ap.add_argument("--mode", choices=["greedy", "beam"], default="greedy",
                    help="decode program to freeze (both deterministic;"
                         " stochastic top-k is interactive-only)")
    ap.add_argument("--topk", type=int, default=4,
                    help="beam width for --mode beam (baked into the"
                         " program)")
    ap.add_argument("--frame_hw", default="240x320",
                    help="decoded frame HxW baked into the program")
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms (e.g. tpu,cpu);"
                         " default: this process's backend")
    ap.add_argument("--data_parallel", action="store_true",
                    help="export the GSPMD-sharded multi-chip program over"
                         " this process's device mesh (--batch must be a"
                         " multiple of the device count); the serving host"
                         " must present an identically-shaped mesh")
    ap.add_argument("--tp_vgg", type=int, choices=[0, 1], default=None,
                    help="1: shard the VGG classifier tensor-parallel over"
                         " the 'model' mesh axis in the exported program"
                         " (needs --num_model N > 1; composes with"
                         " --data_parallel); 0: force replicated weights")
    ap.add_argument("--num_model", type=int, default=None,
                    help="devices on the 'model' mesh axis (override the"
                         " run config)")
    ap.add_argument("--vgg", choices=["vgg16", "vgg19", "tiny"], default=None,
                    help="frontend variant for --random (run_dir uses the"
                         " run's saved config)")
    ap.add_argument("--buckets", action="store_true",
                    help="bucket-ladder artifact: additionally freeze one "
                         "program per quarter/half/full rung level; the "
                         "loader trims short batches to the smallest "
                         "covering level (serving.serve_buckets, frozen)")
    ap.add_argument("--verify", action="store_true",
                    help="reload the artifact and compare picks vs the live"
                         " Summarizer on a zero batch")
    a = ap.parse_args()

    from mmbidaf_tpu.export import ExportedDecoder, export_summarizer
    from mmbidaf_tpu.serving import Summarizer

    h, w = (int(x) for x in a.frame_hw.lower().split("x"))
    platforms = a.platforms.split(",") if a.platforms else None

    dp_kw = (
        {"data_parallel": True, "serve_batch_size": a.batch}
        if a.data_parallel else {}
    )
    dp_kw.update(mode=a.mode, topk=a.topk)
    mesh_over = {}
    if a.tp_vgg is not None:
        mesh_over["tp_vgg"] = bool(a.tp_vgg)
    if a.num_model is not None:
        mesh_over["num_model"] = a.num_model
    if a.run_dir:
        summ = Summarizer.from_run(
            a.run_dir, mesh_overrides=mesh_over or None, **dp_kw
        )
    else:
        import dataclasses

        from mmbidaf_tpu.config import Config, tiny_test_config
        from mmbidaf_tpu.ops.vgg import TINY_SPEC, spec_for_variant

        if a.vgg == "tiny":
            cfg = tiny_test_config()
            # the tiny VGG's flattened feature width (tests/test_serving.py)
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(
                    cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc,
                    vgg_variant="tiny",
                )
            )
            spec = TINY_SPEC
        else:
            variant = a.vgg or "vgg16"
            cfg = Config()
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, vgg_variant=variant)
            )
            spec = spec_for_variant(variant)
        if mesh_over:
            cfg = dataclasses.replace(
                cfg, mesh=dataclasses.replace(cfg.mesh, **mesh_over)
            )
        summ = Summarizer.init_random(cfg, seed=0, vgg_spec=spec, **dp_kw)

    export_summarizer(summ, a.out, batch_size=a.batch, frame_hw=(h, w),
                      platforms=platforms, buckets=a.buckets or None)
    total = sum(
        os.path.getsize(os.path.join(a.out, f)) for f in os.listdir(a.out)
    )
    mode_note = f" mode={a.mode}" + (f"(width {a.topk})" if a.mode == "beam" else "")
    print(f"exported {a.out} ({total / 1e6:.1f} MB) for platforms="
          f"{platforms or 'current'} batch={a.batch} frames={h}x{w}{mode_note}")

    if a.verify:
        import numpy as np

        from mmbidaf_tpu.export import _raw_specs

        import jax.numpy as jnp

        dec = ExportedDecoder(a.out)
        # every frozen program verifies against the live decode at ITS
        # shapes — a bucketed artifact's rung programs must not ship
        # unverified (they'd only fail on the first real short batch)
        for rungs in [None] + list(dec.bucket_levels):
            raw = {
                k: np.zeros(s.shape, s.dtype)
                for k, s in _raw_specs(
                    summ.cfg, a.batch, (h, w), rungs=rungs
                ).items()
            }
            # masks must be non-empty for a meaningful decode
            for k in ("word_mask", "sent_mask", "img_mask", "aud_mask"):
                raw[k] = np.ones_like(raw[k])
            _, picks = dec.decode_raw(raw)
            _, live = summ._decode(
                summ.params, summ.fe_params,
                {k: jnp.asarray(v) for k, v in raw.items()},
            )
            level = "full-cap" if rungs is None else f"rungs {rungs}"
            if not np.array_equal(picks, np.asarray(live)):
                raise SystemExit(
                    f"verify FAILED at {level}: exported picks != live picks"
                )
        n = 1 + len(dec.bucket_levels)
        print(f"verify ok: exported picks == live picks ({n} program(s))")


if __name__ == "__main__":
    main()
