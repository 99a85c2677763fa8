"""NMI eval: fixed-point metric must agree with a naive float NMI and
obey the measure's bounds (the bit-exact oracle twin is covered by the
test_oracle_equivalence sweep)."""

import math
import sys

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.pipelines.linkage_emb import (  # noqa: E402
    _cluster_entity_contingency, nmi_eval,
)

SF = "/root/testdata/sf0.001"


def _naive_nmi(cont, n_c, n_g):
    N = sum(n_c.values())
    mi = sum(
        (int(r["ncg"]) / N)
        * math.log(N * int(r["ncg"]) / (n_c[r["cluster_id"]] * n_g[r["entity_id"]]))
        for r in cont
    )
    hc = -sum((a / N) * math.log(a / N) for a in n_c.values())
    hg = -sum((b / N) * math.log(b / N) for b in n_g.values())
    return mi / (0.5 * (hc + hg))


def test_nmi_matches_naive_and_bounds(ray_session):
    row = nmi_eval(SF).to_pylist()[0]
    cont, n_c, n_g = _cluster_entity_contingency(SF, 5_000_000)
    naive = _naive_nmi(cont, n_c, n_g)
    assert abs(row["nmi_r"] - naive) < 1e-6, (row["nmi_r"], naive)
    assert 0.0 <= row["nmi_r"] <= 1.0
    # entropies are non-negative and MI is bounded by each entropy
    # (slack: each fixed-point term carries up to 0.5 units of rounding)
    slack = len(cont) + len(n_c) + len(n_g)
    assert 0 <= row["mi_fp"] <= min(row["h_cluster_fp"], row["h_entity_fp"]) + slack
    assert row["n_mentions"] > 0
