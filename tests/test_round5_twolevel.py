"""Two-level (coarse-pruned, IVF-style) nearest-seed assignment — the
documented replacement for the flat Lloyd assignment's n·k cross join at
extreme scale (see KMEANS_TARGET_OCCUPANCY's docstring). Non-contract
demonstration: no oracle entry, pinned here instead.

What the tests certify:

- exhaustive equivalence: when nprobe >= k1 (true at every oracle scale:
  k1=2, nprobe=2) the two-level result must EQUAL the flat nearest-seed
  argmin bit-for-bit — the pruning machinery adds no arithmetic drift;
- valid partition: every vector assigned exactly once to a fine seed id;
- structure: the in-cell candidate join scores at most
  nprobe·(fine seeds per probed cell) candidates per vector — the
  corpus never cross-joins the full fine-seed table.

Replica-scale quality (k1=3, probing 2/3 cells on ISOTROPIC vectors —
the hardest case for coarse pruning): measured 78.8% agreement with the
flat argmin, above the ~67% random-probe ceiling; recorded in SCALING.md
§Round 5.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnstap2clickhouse_spark.functions import similarity as fsim
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _flat_nearest_seed(emb: dict[int, np.ndarray], k: int) -> dict[int, int]:
    """Reference flat argmin over the e9-quantized seeds (ties to the
    lowest id), mirroring the module's exact distance contract."""
    out = {}
    seeds = {s: emb[s] for s in range(k)}
    for v, q in emb.items():
        ds = {s: float(np.sum((q - sv) ** 2)) for s, sv in seeds.items()}
        md = min(ds.values())
        out[v] = min(s for s, d in ds.items() if d == md)
    return out


def test_twolevel_equals_flat_when_probes_cover_all_cells(spark):
    rows = fsim.kmeans_assign_twolevel(spark, SF).collect()
    emb = {
        r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 1e9)
        for r in load_table(spark, SF, "embeddings").collect()
    }
    n = len(emb)
    k = fsim.kmeans_k(n)
    k1 = max(2, -(-n // fsim.KMEANS_COARSE_OCCUPANCY))
    assert fsim.KMEANS_COARSE_NPROBE >= k1  # this scale: probes = cells
    two = {r.vec_id: r.cluster for r in rows}
    assert len(two) == n  # exactly one row per vector
    assert set(two.values()) <= set(range(k))
    flat = _flat_nearest_seed(emb, k)
    assert two == flat  # exhaustive probes ⇒ bit-identical to flat


def test_twolevel_plan_never_crossjoins_fine_table(spark):
    """Structural pin: the final scoring join is an equi-join on the
    coarse id — the only CROSS JOINs in the plan are against the
    k1-row coarse table (bounded), never the fine table against the
    corpus."""
    df = fsim.kmeans_assign_twolevel(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the in-cell join must appear as an equi-join condition on coarse
    assert "coarse" in plan
    # physical: no corpus-sized nested loop — every join against q is
    # either the broadcast coarse table or coarse-keyed
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys
