"""StringMap (FastMap) execution method — embedding-based candidate
generation.

Mirrors ``rule/execution/methods/StringMap.scala:13-51`` and its
``Mapper`` (StringMap.scala:53-247), which implements the algorithm
from Jin/Li/Mehrotra, "Efficient Record Linkage in Large Data Sets"
(DASFAA 2003): all string values of a partition pair are embedded into
a ``dimensionality``-dimensional Euclidean space via FastMap-style
pivot projections, a mapped-space threshold is calibrated from sampled
similar pairs, and candidate pairs are the pairs whose embedded
distance is below that threshold.

Like the reference (which indexes every entity to ``Index.default``,
i.e. one block), this is a per-partition method: in the Ray pipeline
it runs inside one scoring partition via
:func:`comparison_pairs`. The pivot choice is deterministic
(StringMap.scala:208-218 replaces the original random seed with fixed
indices) so distributed retries converge.
"""

from __future__ import annotations

import math

from silk_ray.kernel.distances import DistanceMeasure, LevenshteinDistance


class StringMapMapper:
    """FastMap embedding of a string vector (StringMap.scala Mapper)."""

    def __init__(
        self,
        string_vector: list[list[str]],
        distance_metric: DistanceMeasure | None = None,
        dimensionality: int = 20,
    ):
        self.strings = string_vector
        self.metric = distance_metric or LevenshteinDistance()
        self.dim = dimensionality
        n = len(string_vector)
        self.coords = [[0.0] * dimensionality for _ in range(n)]
        self.pivots_a = [0] * dimensionality
        self.pivots_b = [0] * dimensionality
        self._embed()

    # -- embedding -------------------------------------------------------

    def _base_distance(self, s1, c1, s2, c2, dim_limit: int) -> float:
        """Distance in the residual space after the first ``dim_limit``
        projections (StringMap.scala:233-246)."""
        dist = self.metric.apply(s1, s2)
        for i in range(dim_limit):
            x = abs(c1[i] - c2[i])
            dist = math.sqrt(abs(x * x - dist * dist))
        return dist

    def _farthest(self, idx: int, dim_limit: int) -> int:
        farthest, longest = 0, 0.0
        for i in range(len(self.strings)):
            d = self._base_distance(
                self.strings[i], self.coords[i], self.strings[idx], self.coords[idx], dim_limit
            )
            if d > longest:
                farthest, longest = i, d
        return farthest

    def _choose_pivots(self, dim: int) -> None:
        seed_a, seed_b = 0, dim  # deterministic (StringMap.scala:210)
        for _ in range(5):
            seed_a = self._farthest(seed_b, dim)
            seed_b = self._farthest(seed_a, dim)
        self.pivots_a[dim] = seed_a
        self.pivots_b[dim] = seed_b

    def _embed(self) -> None:
        for dim in range(self.dim):
            self._choose_pivots(dim)
            ia, ib = self.pivots_a[dim], self.pivots_b[dim]
            dab = self._base_distance(
                self.strings[ia], self.coords[ia], self.strings[ib], self.coords[ib], dim
            )
            for i in range(len(self.strings)):
                if dab == 0.0:
                    coord = 0.0
                else:
                    x = self._base_distance(
                        self.strings[i], self.coords[i], self.strings[ia], self.coords[ia], dim
                    )
                    y = self._base_distance(
                        self.strings[i], self.coords[i], self.strings[ib], self.coords[ib], dim
                    )
                    coord = (x * x + dab * dab - y * y) / (2.0 * dab)
                self.coords[i][dim] = coord

    # -- queries ---------------------------------------------------------

    @staticmethod
    def mapped_distance(c1, c2) -> float:
        return math.sqrt(sum((a - b) * (a - b) for a, b in zip(c1, c2)))

    def map_value(self, values: list[str]) -> list[float]:
        """Embed an out-of-sample value (StringMap.scala:131-157)."""
        coords: list[float] = []
        for dim in range(self.dim):
            ia, ib = self.pivots_a[dim], self.pivots_b[dim]
            dab = self._base_distance(
                self.strings[ia], self.coords[ia], self.strings[ib], self.coords[ib], dim
            )
            if dab == 0.0:
                coords.append(0.0)
                continue
            x = self._base_distance(values, coords, self.strings[ia], self.coords[ia], dim)
            y = self._base_distance(values, coords, self.strings[ib], self.coords[ib], dim)
            coords.append((x * x + dab * dab - y * y) / (2 * dab))
        return coords

    def compute_threshold(
        self,
        vector1: list[list[str]],
        percentage1: float,
        vector2: list[list[str]],
        percentage2: float,
        distance_threshold: int,
    ) -> float:
        """Calibrate the mapped-space threshold from sampled similar
        pairs (StringMap.scala:96-129)."""
        mapped_threshold = 0.0
        v1 = vector1[: int(len(vector1) * percentage1)]
        v2 = vector2[: int(len(vector2) * percentage2)]
        for s1 in v1:
            for s2 in v2:
                dist = self.metric.apply(s1, s2, distance_threshold)
                if 0 < dist <= distance_threshold:
                    md = self.mapped_distance(self.map_value(s1), self.map_value(s2))
                    if md > mapped_threshold:
                        mapped_threshold = md
        if mapped_threshold == 0.0:
            raise ValueError(
                "Failed to compute a new distance threshold. Possible reasons: "
                "didn't get enough samples from the two lists."
            )
        return mapped_threshold + 1e-5


def comparison_pairs(
    source_values: list[list[str]],
    target_values: list[list[str]],
    dist_threshold: int = 2,
    threshold_percentage: float = 0.5,
    dimensionality: int = 20,
) -> list[tuple[int, int]]:
    """Candidate (source_index, target_index) pairs for one partition
    pair (StringMap.comparisonPairs, StringMap.scala:24-50)."""
    sm = StringMapMapper(
        list(source_values) + list(target_values), dimensionality=dimensionality
    )
    mapped_threshold = sm.compute_threshold(
        source_values, threshold_percentage, target_values, threshold_percentage, dist_threshold
    )
    n_src = len(source_values)
    out = []
    for i in range(n_src):
        for j in range(len(target_values)):
            if sm.mapped_distance(sm.coords[i], sm.coords[n_src + j]) < mapped_threshold:
                out.append((i, j))
    return out
