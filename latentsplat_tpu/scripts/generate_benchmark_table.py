"""Emit a LaTeX timing/memory table from benchmark.json + peak_memory.json.

Parity with reference src/paper/generate_benchmark_table.py:24-63: per
method, mean seconds/call for each timing tag plus peak device memory (GB).

    python -m latentsplat_tpu.scripts.generate_benchmark_table \\
        methods='[{name: Ours, path: outputs/test/latentsplat_tpu}]' \\
        output_path=outputs/benchmark_table.tex
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

from ..config.loader import parse_cli_value


def load_method(path: Path) -> dict:
    timings = json.loads((path / "benchmark.json").read_text())
    memory = {}
    mem_path = path / "peak_memory.json"
    if mem_path.exists():
        memory = json.loads(mem_path.read_text())
    return {"timings": timings, "memory": memory}


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    methods = []
    output_path = Path("outputs/benchmark_table.tex")
    for arg in argv:
        key, _, value = arg.partition("=")
        if key == "methods":
            methods = parse_cli_value(value)
        elif key == "output_path":
            output_path = Path(value)

    assert methods, "pass methods=[{name, path}, ...]"
    rows = []
    all_tags: list[str] = []
    loaded = []
    for m in methods:
        data = load_method(Path(m["path"]))
        loaded.append((m["name"], data))
        for tag in data["timings"]:
            if tag not in all_tags:
                all_tags.append(tag)

    header = "Method & " + " & ".join(
        f"{tag.replace('_', ' ')} (ms)" for tag in all_tags
    ) + " & Peak Mem. (GB) \\\\"
    for name, data in loaded:
        cells = []
        for tag in all_tags:
            times = data["timings"].get(tag)
            cells.append(
                f"{1e3 * sum(times) / len(times):.1f}" if times else "--"
            )
        peak = max(data["memory"].values(), default=0)
        cells.append(f"{peak / 1e9:.2f}" if peak else "--")
        rows.append(f"{name} & " + " & ".join(cells) + " \\\\")

    table = "\n".join(
        ["\\begin{tabular}{l" + "c" * (len(all_tags) + 1) + "}", "\\toprule",
         header, "\\midrule", *rows, "\\bottomrule", "\\end{tabular}"]
    )
    output_path.parent.mkdir(exist_ok=True, parents=True)
    output_path.write_text(table + "\n")
    print(table)


if __name__ == "__main__":
    main()
