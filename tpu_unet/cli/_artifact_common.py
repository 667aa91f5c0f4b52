"""Shared --artifact / --export_artifact wiring for the serve CLIs
(cf. _seg_common.py for the shared seg train/eval driver)."""

from __future__ import annotations


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


def validate_artifact_args(args, sharded: bool, sharded_flags: str) -> None:
    """SystemExit on contradictory flag combinations (before any model work)."""
    if bool(args.artifact) == bool(args.checkpoint):
        raise SystemExit("exactly one of --checkpoint or --artifact is required")
    if args.artifact and args.export_artifact:
        raise SystemExit("--export_artifact requires --checkpoint (an artifact "
                         "is already the exported form)")
    if args.artifact and sharded:
        raise SystemExit(f"{sharded_flags} do not apply to --artifact "
                         "(artifacts are per-chip programs)")


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
