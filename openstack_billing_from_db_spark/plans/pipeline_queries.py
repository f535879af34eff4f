"""Training-data pipeline registry entries (dedup, similarity search,
text analysis, multimodal) — BASELINE.json north-star operators.

Populated by the operators/ modules; see operators/dedup.py,
operators/similarity.py, operators/text.py, operators/multimodal.py.
"""

from __future__ import annotations
