"""Offline tools.

convert-checkpoint: torch .pt (reference whole-module pickles or state dicts)
  -> orbax checkpoint directory, so eval/serving never needs torch at runtime.

    python -m facialmmt_tpu.tools convert-checkpoint \
        --kind unimodal|multimodal|swin|swin_backbone \
        --input pretrained_model/unimodal_model_V.pt --output ckpt/unimodal

print-flops: analytic FLOPs of the Swin backbone (mirrors the reference's
  flops() methods, Swin_Transformer.py:149-429).

doctor: environment readiness report — backend reachability (full
  compile+execute+readback probe, catches the tunnel's degraded mode),
  native loader build, compilation cache, optional deps.  Exit 0 iff the
  backend answered the probe.
"""

from __future__ import annotations

import argparse


def doctor(args) -> None:
    import os
    import sys

    from facialmmt_tpu.utils.tunnel import (enable_compilation_cache,
                                            probe_backend)

    ok = True
    print("facialmmt-tpu doctor")

    backend = probe_backend(timeout_s=args.probe_timeout, emit_json=False,
                            fatal=False)
    if backend is None:
        ok = False
        print(f"  backend            : UNREACHABLE (no compile roundtrip "
              f"within {args.probe_timeout:.0f}s — tunnel down or degraded)")
    else:
        import jax

        devs = jax.devices()
        print(f"  backend            : {backend} x{len(devs)} "
              f"({devs[0].device_kind})")

    cache_dir = enable_compilation_cache()
    if cache_dir is None:
        print("  compilation cache  : UNAVAILABLE")
    elif os.path.isdir(cache_dir):
        entries = os.listdir(cache_dir)
        size = sum(os.path.getsize(os.path.join(cache_dir, f))
                   for f in entries)
        print(f"  compilation cache  : {len(entries)} entries, "
              f"{size / 1e6:.0f} MB ({cache_dir})")
    else:
        print(f"  compilation cache  : empty (will populate at {cache_dir})")

    from facialmmt_tpu.native import load_library

    lib = load_library()
    print(f"  native face loader : "
          f"{'OK (libjpeg-turbo decode+resize)' if lib else 'unavailable -> cv2/PIL fallback'}")

    for mod, why in (("torch", "checkpoint conversion"),
                     ("transformers", "HF tower import"),
                     ("cv2", "face-loader fallback"),
                     ("yaml", "--swin_config_path"),
                     ("sklearn", "metrics cross-check (tests only)")):
        try:
            __import__(mod)
            print(f"  {mod:<19}: OK ({why})")
        except ImportError:
            print(f"  {mod:<19}: MISSING ({why})")

    sys.stdout.flush()
    sys.stderr.flush()
    # os._exit, not sys.exit: when the probe failed, its abandoned thread is
    # still latched inside backend init and normal interpreter teardown
    # SIGABRTs ("FATAL: exception not rethrown")
    os._exit(0 if ok else 3)


def convert_checkpoint(args) -> None:
    from facialmmt_tpu.checkpoint.orbax_io import CheckpointManager
    from facialmmt_tpu.checkpoint.torch_convert import (
        convert_multimodal, convert_pretrained_swin_backbone,
        convert_swin_fer, convert_unimodal, load_torch_state_dict)
    from facialmmt_tpu.config import FacialMMTConfig

    cfg = FacialMMTConfig(plm_name=args.plm_name)
    sd = load_torch_state_dict(args.input)
    kind = args.kind
    if kind == "unimodal":
        tree = convert_unimodal(sd, cfg)
    elif kind == "multimodal":
        tree = convert_multimodal(sd, cfg)
    elif kind == "swin":
        tree = convert_swin_fer(sd, cfg)
    elif kind == "swin_backbone":
        tree = convert_pretrained_swin_backbone(sd, cfg)
    else:
        raise SystemExit(f"unknown --kind {kind}")
    import os

    out_dir, tag = os.path.split(args.output.rstrip("/"))
    mgr = CheckpointManager(out_dir or ".", keep_best_only=False)
    path = mgr.save(tag, tree)
    n = sum(x.size for x in _leaves(tree))
    print(f"converted {args.input} ({kind}, {n / 1e6:.1f}M params) -> {path}")


def _leaves(tree):
    import jax

    return [x for x in jax.tree.leaves(tree) if hasattr(x, "size")]


def export_checkpoint(args) -> None:
    """Orbax checkpoint -> reference-layout torch state_dict .pt files, so an
    external machine with the released MELD data can run the reference's own
    --doEval on models trained here (reference utils/util.py:121-159).

    --kind pipeline reads a multi-task best checkpoint
    ({params: {multimodal, swin_model}, batch_stats}) and writes BOTH
    <output>_multimodal.pt and <output>_swin.pt, matching the reference's
    two-file persistence (save_Multimodal_model + save_Swin_model).
    """
    import os

    from facialmmt_tpu.checkpoint.orbax_io import CheckpointManager
    from facialmmt_tpu.checkpoint.torch_export import (export_multimodal,
                                                       export_swin_fer,
                                                       export_unimodal,
                                                       save_state_dict_pt)

    in_dir, tag = os.path.split(args.input.rstrip("/"))
    tree = CheckpointManager(in_dir or ".", keep_best_only=False).restore(tag)

    def _write(sd, path):
        save_state_dict_pt(sd, path)
        print(f"exported {len(sd)} tensors -> {path}")

    if args.kind == "unimodal":
        _write(export_unimodal(tree), args.output)
    elif args.kind == "multimodal":
        _write(export_multimodal(tree, args.plm_name), args.output)
    elif args.kind == "swin":
        _write(export_swin_fer(tree), args.output)
    elif args.kind == "pipeline":
        base = args.output[:-3] if args.output.endswith(".pt") else args.output
        _write(export_multimodal({"params": tree["params"]["multimodal"]},
                                 args.plm_name), f"{base}_multimodal.pt")
        _write(export_swin_fer(
            {"params": tree["params"]["swin_model"],
             "batch_stats": tree["batch_stats"]["swin_model"]}),
            f"{base}_swin.pt")
    else:
        raise SystemExit(f"unknown --kind {args.kind}")


def print_flops(args) -> None:
    from facialmmt_tpu.config import FacialMMTConfig
    from facialmmt_tpu.ops.swin import swin_flops
    from facialmmt_tpu.utils.flops import eval_step_macs

    cfg = FacialMMTConfig()
    f = swin_flops(cfg.swin)
    print(f"swin-tiny forward: {f / 1e9:.2f} GMACs/image "
          f"({f * args.batch / 1e12:.2f} TMACs at batch {args.batch})")
    m = eval_step_macs(cfg, args.batch, max(args.batch // 8, 1),
                       args.faces_per_utt * args.batch)
    print(f"full T+A+V eval batch ({args.batch} utts, "
          f"{args.faces_per_utt} faces/utt): {m / 1e9:.1f} GMACs "
          f"= {2 * m / 1e12:.2f} TFLOPs")


def main(argv=None):
    p = argparse.ArgumentParser(prog="facialmmt_tpu.tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert-checkpoint")
    c.add_argument("--kind", required=True,
                   choices=["unimodal", "multimodal", "swin", "swin_backbone"])
    c.add_argument("--input", required=True)
    c.add_argument("--output", required=True)
    c.add_argument("--plm_name", default="roberta-large")
    c.set_defaults(func=convert_checkpoint)

    e = sub.add_parser("export-checkpoint")
    e.add_argument("--kind", required=True,
                   choices=["unimodal", "multimodal", "swin", "pipeline"])
    e.add_argument("--input", required=True,
                   help="orbax checkpoint dir (e.g. saved_model/best_3)")
    e.add_argument("--output", required=True, help=".pt path to write")
    e.add_argument("--plm_name", default="roberta-large")
    e.set_defaults(func=export_checkpoint)

    f = sub.add_parser("print-flops")
    f.add_argument("--batch", type=int, default=1)
    f.add_argument("--faces_per_utt", type=int, default=8)
    f.set_defaults(func=print_flops)

    d = sub.add_parser("doctor")
    d.add_argument("--probe_timeout", type=float, default=90.0)
    d.set_defaults(func=doctor)

    args = p.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
