"""Power-schedule planner — the reference's PowersDag re-imagined as a static
wavefront schedule.

The reference builds a DAG over target powers with greedy depth-minimizing
parent search and executes it with a lock-free thread wavefront
(/root/reference/common/apsu/powers.h:42,159-278, powers.cpp:56-99).  On TPU
the natural form is a *static schedule*: a list of levels, each level a batch
of (target, a, b) products executed as ONE batched ct×ct multiply +
relinearize kernel call — level-synchronous wavefronts instead of atomics.

Paterson–Stockmeyer splitting follows the reference's convention
(bin_bundle.cpp:192-360): with ps_low_degree = ℓ, the evaluator needs low
powers {1..ℓ} and high powers {(ℓ+1)·j}; the high DAG is planned in the
divided domain (powers of y = x^(ℓ+1)).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple


@dataclass
class PowerSchedule:
    sources: Tuple[int, ...]
    max_power: int
    # levels[d] = list of (target, a, b): target = a + b, both available at
    # depth < d.  Level 0 is implicit (the sources themselves).
    levels: List[List[Tuple[int, int, int]]] = field(default_factory=list)

    @property
    def depth(self) -> int:
        return len(self.levels)

    def all_powers(self) -> List[int]:
        return list(range(1, self.max_power + 1))


def plan_powers(sources: Sequence[int], max_power: int) -> PowerSchedule:
    """Greedy depth-optimal schedule computing every power 1..max_power."""
    sources = tuple(sorted(set(int(s) for s in sources)))
    if 1 not in sources:
        raise ValueError("sources must contain 1")
    if max(sources) > max_power:
        sources = tuple(s for s in sources if s <= max_power)
    depth: Dict[int, int] = {s: 0 for s in sources}
    parents: Dict[int, Tuple[int, int]] = {}
    for p in range(2, max_power + 1):
        if p in depth:
            continue
        best = None
        best_pair = None
        for a in range(1, p // 2 + 1):
            b = p - a
            if a in depth and b in depth:
                d = max(depth[a], depth[b]) + 1
                if best is None or d < best:
                    best, best_pair = d, (a, b)
        if best is None:
            raise ValueError(f"cannot reach power {p} from sources {sources}")
        depth[p] = best
        parents[p] = best_pair
    max_depth = max(depth.values(), default=0)
    levels: List[List[Tuple[int, int, int]]] = [[] for _ in range(max_depth)]
    for p, d in sorted(depth.items()):
        if d > 0:
            a, b = parents[p]
            levels[d - 1].append((p, a, b))
    return PowerSchedule(sources=sources, max_power=max_power, levels=levels)


@dataclass
class QueryPlan:
    """Full power plan for a parameter set (low + optional PS-high domain)."""

    ps_low_degree: int            # 0 = no Paterson-Stockmeyer
    low: PowerSchedule            # powers of x: 1..(ℓ or max_items_per_bin)
    high: PowerSchedule | None    # powers of y = x^(ℓ+1): 1..⌊K/(ℓ+1)⌋

    @property
    def uses_ps(self) -> bool:
        return self.ps_low_degree > 0


def plan_query(query_powers: Sequence[int], max_items_per_bin: int, ps_low_degree: int) -> QueryPlan:
    qp = sorted(set(int(s) for s in query_powers))
    if ps_low_degree == 0:
        return QueryPlan(
            ps_low_degree=0,
            low=plan_powers(qp, max_items_per_bin),
            high=None,
        )
    ph = ps_low_degree + 1
    low_sources = [s for s in qp if s <= ps_low_degree]
    high_sources = [s // ph for s in qp if s > ps_low_degree]
    if any(s % ph for s in qp if s > ps_low_degree):
        raise ValueError("high query powers must be multiples of ps_low_degree+1")
    n_high = max_items_per_bin // ph
    return QueryPlan(
        ps_low_degree=ps_low_degree,
        low=plan_powers(low_sources, ps_low_degree),
        high=plan_powers(high_sources, max(n_high, 1)),
    )
