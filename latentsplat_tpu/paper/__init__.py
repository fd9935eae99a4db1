"""Paper tooling: LaTeX table and figure generators.

Parity with reference src/paper/*.py (1229 LoC of one-off generators that
consume test-run outputs). Differences by design: figures are composed as
raster PNGs with the visualization.layout toolkit instead of SVG + an
inkscape subprocess (src/paper/common.py:31-47) — this environment has no
inkscape, and raster composition keeps the generators dependency-free.
"""

from .table import make_latex_table

__all__ = ["make_latex_table"]
