"""Evaluation index entry type.

Parity with reference src/evaluation/types.py: a frozen (context, target)
view-index selection per scene, serialized to the benchmark JSON files under
assets/evaluation_index/.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple


@dataclass(frozen=True)
class IndexEntry:
    context: Tuple[int, ...]
    target: Tuple[int, ...]

    @classmethod
    def from_dict(cls, d: dict) -> "IndexEntry":
        return cls(context=tuple(d["context"]), target=tuple(d["target"]))

    def to_dict(self) -> dict:
        return {"context": list(self.context), "target": list(self.target)}
