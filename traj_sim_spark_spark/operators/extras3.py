"""Round-3 operators: 2-D segment-geometry search tier.

The reference's flagship query family is similarity SEARCH over segment
geometry (DFT, Xie/Li/Phillips PVLDB 2017 §4-5): kNN and threshold
search under the segment-based Hausdorff distance in the plane.  Round 2
landed the building blocks — the eps-cell scatter range query
(``traj_range_segments_2d``, extras2.py) and the integer point-to-segment
kernel (``traj_hausdorff_segments_pair_2d``, extras2.py) — this module
composes them into the search tier.

Registered FIRST in ``registry._MODULES``'s round-3 window tail so the
new ops get driver correctness rows.
"""

from __future__ import annotations
