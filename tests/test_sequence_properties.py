"""Oracle-independent validation of the sequence/changepoint family:
Markov transition machinery via literal dict counting, CUSUM and
binary segmentation via direct integer scans, and Holt-Winters via a
step-by-step triple-smoothing loop with a rotating seasonal list.
Sixth module of the independence campaign.

All at sf0.001.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")
    return df.sort_values(["user_id", "ts", "event_id"])


@pytest.fixture(scope="module")
def transitions(ev) -> dict:
    """(prev, next) -> count over per-user (ts, event_id) order."""
    t: dict = {}
    for _, sub in ev.groupby("user_id"):
        types = sub.event_type.tolist()
        for a, b in zip(types, types[1:]):
            t[(a, b)] = t.get((a, b), 0) + 1
    return t


def test_markov_transitions_match_dict_loop(spark, transitions):
    rows = QUERIES["markov_event_transitions"](spark, SF_DIR).collect()
    got = {(r.prev_type, r.next_type): r for r in rows}
    assert set(got) == set(transitions)
    prev_tot: dict = {}
    for (a, _), c in transitions.items():
        prev_tot[a] = prev_tot.get(a, 0) + c
    for k, c in transitions.items():
        assert got[k].n_transitions == c, k
        assert abs(got[k].transition_prob - c / prev_tot[k[0]]) < 1e-6, k


def test_markov_prediction_matches_argmax(spark, transitions):
    rows = {r.prev_type: r for r in QUERIES["markov_prediction_accuracy"](spark, SF_DIR).collect()}
    prevs = {a for a, _ in transitions}
    assert set(rows) == prevs
    for a in prevs:
        outs = {b: c for (x, b), c in transitions.items() if x == a}
        best = min(outs, key=lambda b: (-outs[b], b))  # count desc, name asc
        tot = sum(outs.values())
        r = rows[a]
        assert r.predicted_next == best, a
        assert r.n_transitions == tot, a
        assert abs(r.top1_accuracy - outs[best] / tot) < 1e-6, a


def test_markov_entropy_matches_direct_sum(spark, transitions):
    prev_tot: dict = {}
    for (a, _), c in transitions.items():
        prev_tot[a] = prev_tot.get(a, 0) + c
    n = sum(transitions.values())
    h = -sum(c * np.log2(c / prev_tot[a]) for (a, _), c in transitions.items()) / n
    row = QUERIES["markov_entropy_rate"](spark, SF_DIR).collect()[0]
    assert row.n_transitions == n
    assert abs(row.entropy_rate_bits - h) < 1e-5
    assert abs(row.entropy_ratio - h / np.log2(row.n_states)) < 1e-5


def test_cusum_matches_integer_scan(spark, ev):
    """Replicates the NULL bookkeeping: n and row numbers count every
    row, sums skip NULL values."""
    from iot_etl_spark.plans.queries_analytics2 import CUSUM_SIGMA

    rows = {r.user_id: r for r in QUERIES["changepoint_cusum"](spark, SF_DIR).collect()}
    checked = 0
    for u, sub in ev.groupby("user_id"):
        vq = [
            None if pd.isna(v) else int(np.sign(v) * np.floor(abs(v) * 1e6 + 0.5))
            for v in sub.value
        ]
        n = len(vq)
        nn = [x for x in vq if x is not None]
        tot, s2 = sum(nn), sum(x * x for x in nn)
        varu = (n * float(s2) - float(tot) ** 2) / (n * (n - 1))
        pk = 0
        max_cu = 0.0
        exceed = 0
        for k, x in enumerate(vq, start=1):
            if x is not None:
                pk += x
            cu = abs(n * pk - k * tot) / n
            max_cu = max(max_cu, cu)
            exceed += cu > CUSUM_SIGMA * np.sqrt(varu)
        r = rows[u]
        assert r.n_events == n, u
        assert abs(r.max_abs_cusum - max_cu / 1e6) < 1e-5, u
        assert r.n_exceedances == exceed, u
        checked += 1
    assert checked >= 10


def test_binseg_matches_direct_argmax(spark, ev):
    h = ev.assign(hr=ev.ts.values.astype("datetime64[h]")).groupby("hr").size().sort_index()
    y = h.to_numpy().astype(np.int64)
    epochs = h.index.values.astype("datetime64[s]").astype(np.int64)

    def best(idx0, ys):
        m, T = len(ys), int(ys.sum())
        P = np.cumsum(ys)
        c = np.abs(m * P - np.arange(1, m + 1) * T)
        j = int(np.argmax(c))  # np.argmax returns first max = earliest idx
        return idx0 + j, int(c[j])

    t1_pos, c1 = best(0, y)
    l_pos, cl = best(0, y[: t1_pos + 1])
    r_pos, cr = best(t1_pos + 1, y[t1_pos + 1:])
    rows = {(r.level, r.segment): r for r in QUERIES["binseg_changepoints"](spark, SF_DIR).collect()}
    assert rows[(1, "all")].t_idx == t1_pos + 1
    assert rows[(1, "all")].stat_abs == c1
    assert rows[(1, "all")].bucket_epoch == int(epochs[t1_pos])
    assert rows[(2, "left")].t_idx == l_pos + 1
    assert rows[(2, "left")].stat_abs == cl
    assert rows[(2, "right")].t_idx == r_pos + 1
    assert rows[(2, "right")].stat_abs == cr


def test_holt_winters_matches_sequential_loop(spark, ev):
    from iot_etl_spark.plans.queries_analytics4 import HW_HORIZON, HW_PERIOD

    alpha, beta, gamma = 0.2, 0.05, 0.1
    h = ev.assign(hr=ev.ts.values.astype("datetime64[h]")).groupby("hr").size().sort_index()
    y = [float(v) for v in h.to_numpy()]
    m1 = sum(y[:HW_PERIOD]) / HW_PERIOD
    tr = (sum(y[HW_PERIOD:2 * HW_PERIOD]) / HW_PERIOD - m1) / HW_PERIOD
    lv = m1
    seas = [v - m1 for v in y[:HW_PERIOD]]
    sse = 0.0
    for x in y[HW_PERIOD:]:
        s0 = seas.pop(0)
        pred = lv + tr + s0
        sse += (x - pred) * (x - pred)
        lv2 = alpha * (x - s0) + (1 - alpha) * (lv + tr)
        tr = beta * (lv2 - lv) + (1 - beta) * tr
        seas.append(gamma * (x - lv2) + (1 - gamma) * s0)
        lv = lv2
    rows = {r.horizon_hours: r for r in QUERIES["holt_winters_hourly"](spark, SF_DIR).collect()}
    assert len(rows) == HW_HORIZON
    for hz in range(1, HW_HORIZON + 1):
        r = rows[hz]
        assert abs(r.level - lv) < 1e-6
        assert abs(r.trend - tr) < 1e-6
        assert abs(r.sse - sse) < 1e-4
        assert abs(r.forecast - (lv + hz * tr + seas[(hz - 1) % HW_PERIOD])) < 1e-5, hz
