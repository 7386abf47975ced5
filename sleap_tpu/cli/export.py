"""``sleap-export``: export trained models for deployment.

Rebuild of the reference CLI (``/root/reference/sleap/nn/inference.py:5050``).
"""

from __future__ import annotations

import argparse
from typing import List, Optional


def main(args: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="Export a sleap-tpu model.")
    parser.add_argument(
        "-m", "--model", action="append", dest="models", required=True,
        help="Model run folder (repeatable).",
    )
    parser.add_argument("-e", "--export_path", default="exported_model")
    parser.add_argument("-n", "--max_instances", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--image_size", type=int, default=None)
    ns = parser.parse_args(args)

    from sleap_tpu.inference.export import export_model

    out = export_model(
        ns.models if len(ns.models) > 1 else ns.models[0],
        save_path=ns.export_path,
        batch_size=ns.batch_size,
        image_size=ns.image_size,
        max_instances=ns.max_instances,
    )
    print(f"Exported to: {out}")


if __name__ == "__main__":
    main()
