"""``sleap-convert``: convert labels between formats.

Rebuild of ``/root/reference/sleap/io/convert.py:101`` with the same format
surface: slp <-> analysis h5/csv, plus import of dlc/coco/alphatracker/leap.
"""

from __future__ import annotations

import os
from typing import Optional


def convert(
    input_path: str,
    output_path: Optional[str] = None,
    input_format: str = "",
    output_format: str = "slp",
) -> str:
    from sleap_tpu.core.labels import Labels
    from sleap_tpu.io import formats

    labels = formats.read(input_path, as_format=input_format or None)

    if output_format in ("analysis", "analysis.h5", "h5"):
        from sleap_tpu.info.write_tracking_h5 import export_analysis_file

        out = output_path or (input_path + ".analysis.h5")
        export_analysis_file(labels, out, labels_path=input_path)
        return out
    if output_format in ("analysis.csv", "csv"):
        from sleap_tpu.info.write_tracking_h5 import export_analysis_file

        out = output_path or (input_path + ".analysis.csv")
        export_analysis_file(labels, out, labels_path=input_path, csv=True)
        return out
    if output_format in ("slp", "pkg.slp"):
        out = output_path or (os.path.splitext(input_path)[0] + f".{output_format}")
        labels.save(out, with_images=(output_format == "pkg.slp"))
        return out
    if output_format == "nwb":
        out = output_path or (os.path.splitext(input_path)[0] + ".nwb")
        labels.export_nwb(out)
        return out
    if output_format == "nix":
        out = output_path or (os.path.splitext(input_path)[0] + ".nix")
        labels.export_nix(out)
        return out
    raise ValueError(f"Unsupported output format: {output_format!r}.")


def main(args=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(description="Convert between label formats.")
    parser.add_argument("input_path")
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--input_format", default="")
    parser.add_argument("--format", default="slp", help="Output format.")
    ns = parser.parse_args(args)
    out = convert(
        ns.input_path,
        output_path=ns.output,
        input_format=ns.input_format,
        output_format=ns.format,
    )
    print(f"Saved: {out}")


if __name__ == "__main__":
    main()
