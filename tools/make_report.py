#!/usr/bin/env python3
"""Self-contained HTML report for an experiment directory.

Collects the JSON artifacts the CLIs write (args.json, training_results.json,
test_metrics.json / evaluation_results.json, detailed_results.json) and every
rendered PNG (training curves, confusion matrices, prediction panels) under a
directory tree, and emits ONE portable report.html with the images base64-inlined
— shareable from a headless TPU host with scp alone. A capability the reference
lacks (its artifacts stay scattered as loose files).

Usage:
  python tools/make_report.py --experiment_dir outputs/<exp> [--output report.html]
"""

from __future__ import annotations

import argparse
import base64
import html
import json
import os
from typing import Dict, List, Optional

_KNOWN_JSON = ("args.json", "training_results.json", "test_metrics.json",
               "evaluation_results.json", "pipeline_config.txt")

_CSS = """
body { font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 1100px;
       color: #1a1a1a; }
h1 { border-bottom: 2px solid #444; padding-bottom: .3rem; }
h2 { margin-top: 2rem; color: #234; }
table { border-collapse: collapse; margin: .5rem 0; }
td, th { border: 1px solid #ccc; padding: .25rem .6rem; text-align: left;
         font-size: .92rem; }
th { background: #f0f2f5; }
img { max-width: 100%; border: 1px solid #ddd; margin: .4rem 0; }
.imggrid img { max-width: 520px; }
code, pre { background: #f6f6f6; padding: .1rem .3rem; font-size: .85rem; }
.num { font-variant-numeric: tabular-nums; }
"""


def _find(root: str, names) -> Dict[str, str]:
    found = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f in names and f not in found:
                found[f] = os.path.join(dirpath, f)
    return found


def _find_pngs(root: str) -> List[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in sorted(files)
                   if f.endswith(".png"))
    return out


def _img_tag(path: str) -> str:
    with open(path, "rb") as f:
        b64 = base64.b64encode(f.read()).decode()
    name = html.escape(os.path.basename(path))
    return (f"<figure><img src='data:image/png;base64,{b64}' alt='{name}'/>"
            f"<figcaption><code>{name}</code></figcaption></figure>")


def _table(d: Dict, title: Optional[str] = None, max_rows: int = 80) -> str:
    rows = []
    for k, v in list(d.items())[:max_rows]:
        if isinstance(v, float):
            v = f"{v:.6g}"
        elif isinstance(v, (dict, list)):
            v = html.escape(json.dumps(v)[:300])
        rows.append(f"<tr><th>{html.escape(str(k))}</th>"
                    f"<td class='num'>{html.escape(str(v))}</td></tr>")
    head = f"<h3>{html.escape(title)}</h3>" if title else ""
    return f"{head}<table>{''.join(rows)}</table>"


def _flatten_metrics(blob: Dict) -> List[str]:
    """Render the known metric JSON shapes as tables."""
    parts = []
    for key in ("image_metrics", "overall_metrics", "pixel_metrics",
                "type_metrics", "per_type_metrics", "per_class_metrics", "loss"):
        if isinstance(blob.get(key), dict) and blob[key]:
            sub = blob[key]
            # per_class arrays -> one row per class
            if key == "per_class_metrics":
                classes = max((len(v) for v in sub.values()
                               if isinstance(v, list)), default=0)
                header = "".join(f"<th>{html.escape(m)}</th>" for m in sub)
                body = "".join(
                    "<tr><th>class %d</th>%s</tr>" % (c, "".join(
                        f"<td class='num'>{sub[m][c]:.4f}</td>" if isinstance(sub[m], list)
                        and c < len(sub[m]) else "<td></td>" for m in sub))
                    for c in range(classes))
                parts.append(f"<h3>per-class metrics</h3><table><tr><th></th>"
                             f"{header}</tr>{body}</table>")
            elif key in ("type_metrics", "per_type_metrics"):
                for t, m in sub.items():
                    if isinstance(m, dict):
                        parts.append(_table(m, f"anomaly type: {t}"))
            else:
                parts.append(_table(sub, key.replace("_", " ")))
    for key in ("threshold", "num_samples", "num_anomalies"):
        if key in blob and not isinstance(blob[key], (dict, list)):
            parts.append(f"<p><b>{html.escape(key)}</b>: "
                         f"{html.escape(str(blob[key]))}</p>")
    return parts


def build_report(experiment_dir: str, output: str,
                 max_images: int = 24) -> str:
    artifacts = _find(experiment_dir, _KNOWN_JSON)
    pngs = _find_pngs(experiment_dir)

    parts = [f"<html><head><meta charset='utf-8'><style>{_CSS}</style>",
             f"<title>tpu-unet report</title></head><body>",
             f"<h1>tpu-unet experiment report</h1>",
             f"<p><code>{html.escape(os.path.abspath(experiment_dir))}</code></p>"]

    if "args.json" in artifacts:
        with open(artifacts["args.json"]) as f:
            parts.append("<h2>Run configuration</h2>")
            parts.append(_table(json.load(f)))

    if "training_results.json" in artifacts:
        with open(artifacts["training_results.json"]) as f:
            tr = json.load(f)
        parts.append("<h2>Training</h2>")
        scalars = {k: v for k, v in tr.items() if not isinstance(v, (list, dict))}
        if scalars:
            parts.append(_table(scalars))
        losses = tr.get("train_losses")
        if isinstance(losses, list) and losses:
            parts.append(f"<p>epochs: {len(losses)}; final train loss "
                         f"<b>{losses[-1]:.5g}</b>"
                         + (f"; final val loss <b>{tr['val_losses'][-1]:.5g}</b>"
                            if tr.get("val_losses") else "") + "</p>")

    for name, title in (("test_metrics.json", "Evaluation (anomaly)"),
                        ("evaluation_results.json", "Evaluation (segmentation)")):
        if name in artifacts:
            with open(artifacts[name]) as f:
                blob = json.load(f)
            parts.append(f"<h2>{title}</h2>")
            parts.extend(_flatten_metrics(blob))

    if "pipeline_config.txt" in artifacts:
        with open(artifacts["pipeline_config.txt"]) as f:
            parts.append("<h2>Pipeline configuration</h2>")
            parts.append(f"<pre>{html.escape(f.read())}</pre>")

    if pngs:
        parts.append(f"<h2>Figures ({min(len(pngs), max_images)} of {len(pngs)})</h2>"
                     "<div class='imggrid'>")
        parts.extend(_img_tag(p) for p in pngs[:max_images])
        parts.append("</div>")

    parts.append("</body></html>")
    with open(output, "w") as f:
        f.write("\n".join(parts))
    return output


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--experiment_dir", type=str, required=True,
                        help="Experiment/output directory to walk")
    parser.add_argument("--output", type=str, default=None,
                        help="Report path (default: <experiment_dir>/report.html)")
    parser.add_argument("--max_images", type=int, default=24)
    args = parser.parse_args(argv)
    if not os.path.isdir(args.experiment_dir):
        raise SystemExit(f"error: --experiment_dir not found: {args.experiment_dir}")
    out = args.output or os.path.join(args.experiment_dir, "report.html")
    path = build_report(args.experiment_dir, out, args.max_images)
    size = os.path.getsize(path) / 1e6
    print(f"Report written: {path} ({size:.2f} MB)")
    return path


if __name__ == "__main__":
    main()
