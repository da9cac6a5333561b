"""CLI client — the engine's counterpart of the reference's
examples/demo_client.py (parse one file, print a summary, save
`<file>.<mode>.json`; reference behavior at demo_client.py:23-96).
No HTTP and no Spark session: the facade runs the engine's own Arrow
kernels in-process, so this works anywhere engine.zip is on the path.

    python jobs/parse_file.py doc.pdf --mode fast
    python jobs/parse_file.py page.html            # mode auto
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="two-tier parser CLI client")
    ap.add_argument("file", type=Path, help="path to a .pdf/.html/.ttdp file")
    ap.add_argument(
        "--mode",
        default="auto",
        choices=["auto", "fast", "accurate"],
        help="tier selection (reference client picks by endpoint)",
    )
    args = ap.parse_args(argv)

    from two_tier_document_parser_spark.api import parse_bytes

    t0 = time.time()
    result = parse_bytes(args.file.read_bytes(), args.file.name, args.mode)
    wall_ms = int((time.time() - t0) * 1000)

    out_file = args.file.with_suffix(f".{args.mode}.json")
    out_file.write_text(json.dumps(result, indent=2))

    if "error" in result:
        print(json.dumps({"error": result["error"], "output": str(out_file)}))
        return 1
    meta = result.get("metadata", {})
    print(
        json.dumps(
            {
                "pages": meta.get("pages"),
                "markdown_chars": len(result.get("markdown", "")),
                "images": len(result.get("images", [])),
                "tables": len(result.get("tables", [])),
                "formulas": len(result.get("formulas", [])),
                "wall_ms": wall_ms,
                "output": str(out_file),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
