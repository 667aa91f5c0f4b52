"""Shared --artifact / --export_artifact wiring for the serve CLIs
(cf. _seg_common.py for the shared seg train/eval driver)."""

from __future__ import annotations

import sys


def add_artifact_args(p) -> None:
    p.add_argument("--artifact", type=str, default=None,
                   help="Serve from an AOT-exported artifact directory "
                        "(tpu_unet.serve_artifact) instead of --checkpoint; "
                        "batch/image geometry come from the artifact")
    p.add_argument("--export_artifact", type=str, default=None,
                   help="After building the engine from --checkpoint, export "
                        "it as a self-contained serving artifact to this dir")
    p.add_argument("--artifact_platforms", type=str, default=None,
                   help="Comma-separated lowering platforms for "
                        "--export_artifact (e.g. 'tpu,cpu' to cross-export a "
                        "TPU-ready artifact from a CPU host); default: the "
                        "current backend")


def add_bucket_arg(p) -> None:
    p.add_argument("--bucket_sizes", type=str, default=None,
                   help="Comma-separated batch-shape ladder (e.g. '1,2,4'): "
                        "a ragged batch pads to the smallest adequate "
                        "compiled bucket instead of the full --batch_size "
                        "(one extra compile per bucket; --batch_size is "
                        "always the top bucket). Exported artifacts embed "
                        "one program per bucket (format v2)")


def parse_bucket_sizes(args, batch_size=None):
    """--bucket_sizes string -> list of ints (None when unset), with clean
    SystemExit messages; ``batch_size`` additionally range-checks the ladder
    before any engine/calibration work."""
    if not getattr(args, "bucket_sizes", None):
        return None
    try:
        buckets = [int(tok) for tok in args.bucket_sizes.split(",") if tok]
    except ValueError:
        raise SystemExit(f"--bucket_sizes must be comma-separated integers, "
                         f"got {args.bucket_sizes!r}")
    if batch_size is not None:
        from tpu_unet.serve import _normalize_buckets
        try:
            _normalize_buckets(buckets, batch_size)
        except ValueError as e:
            raise SystemExit(f"--bucket_sizes: {e}")
    return buckets


def validate_artifact_args(args, parser, sharded: bool, sharded_flags: str,
                           baked_flags: tuple = ()) -> None:
    """SystemExit on contradictory flag combinations (before any model work).

    ``sharded`` must only count flag values that actually build a mesh
    (n_devices=1 is the unsharded engine, serve.py from_variables semantics).
    ``baked_flags``: engine-construction arg names whose values are baked into
    an artifact at export time — explicitly setting them in --artifact mode
    has no effect, so a non-default value draws a stderr warning.
    """
    if bool(args.artifact) == bool(args.checkpoint):
        raise SystemExit("exactly one of --checkpoint or --artifact is required")
    if args.artifact and args.export_artifact:
        raise SystemExit("--export_artifact requires --checkpoint (an artifact "
                         "is already the exported form)")
    if sharded and (args.artifact or args.export_artifact):
        which = "--artifact" if args.artifact else "--export_artifact"
        raise SystemExit(f"{sharded_flags} do not apply to {which} "
                         "(artifacts are per-chip programs)")
    if args.artifact:
        ignored = [f"--{name}" for name in baked_flags
                   if getattr(args, name) != parser.get_default(name)]
        if ignored:
            print("WARNING: ignored in --artifact mode (batch/image geometry, "
                  "precision, and quantization are baked into the artifact): "
                  + ", ".join(ignored), file=sys.stderr)


def load_artifact_engine(args):
    from tpu_unet.serve_artifact import load_artifact
    engine = load_artifact(args.artifact)
    geometry = getattr(engine, "image_size", None) or engine.image_size_hw
    print(f"Loaded serving artifact {args.artifact} "
          f"(batch {engine.batch_size} @ {geometry})")
    return engine


def maybe_export_artifact(engine, args) -> None:
    if not args.export_artifact:
        return
    from tpu_unet.serve_artifact import export_artifact
    plats = (args.artifact_platforms.split(",")
             if args.artifact_platforms else None)
    meta = export_artifact(engine, args.export_artifact, platforms=plats)
    print(f"Serving artifact exported to {args.export_artifact} "
          f"(platforms {meta['platforms']})")
