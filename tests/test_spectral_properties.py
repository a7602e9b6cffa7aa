"""Oracle-independent validation of the stability/spectral family:
Allan variance, Hurst R/S, lead-lag cross-correlation, and ACF/PACF —
each replayed with literal block/bucket loops over the raw parquet.
Thirteenth module of the independence campaign.

All at sf0.001.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from iot_etl_spark.plans import QUERIES
from tests.conftest import SF_DIR

EVENTS = f"{SF_DIR}/events.parquet"


def _ha_int(v: float) -> int:
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


@pytest.fixture(scope="module")
def ev() -> pd.DataFrame:
    df = pd.read_parquet(EVENTS)
    df["ts"] = pd.to_datetime(df["ts"]).dt.floor("us")
    df["epoch"] = df.ts.values.astype("datetime64[s]").astype(np.int64)
    return df


def test_allan_variance_matches_bucket_loop(spark, ev):
    from iot_etl_spark.plans.queries_analytics3 import ALLAN_TAUS_H

    d = ev[ev.value.notna()].copy()
    d["cents"] = np.round(d.value * 100).astype(np.int64)
    rows = {
        (r.tau_hours, r.user_id): r
        for r in QUERIES["allan_variance_per_device"](spark, SF_DIR).collect()
    }
    seen = set()
    for tau in ALLAN_TAUS_H:
        d["bk"] = d.epoch // (3600 * tau)
        for u, sub in d.groupby("user_id"):
            g = sub.groupby("bk").cents.agg(["sum", "size"]).sort_index()
            bks = g.index.to_numpy()
            means = (g["sum"].to_numpy() / 100) / g["size"].to_numpy()
            nano = 0
            n_pairs = 0
            for i in range(1, len(bks)):
                if bks[i] - bks[i - 1] == 1:
                    nano += _ha_int((means[i] - means[i - 1]) ** 2 * 1e9)
                    n_pairs += 1
            if n_pairs == 0:
                assert (tau, u) not in rows
                continue
            r = rows[(tau, u)]
            assert r.n_pairs == n_pairs, (tau, u)
            assert abs(r.allan_var - nano / 1e9 / (2 * n_pairs)) < 1e-9, (tau, u)
            seen.add((tau, u))
    assert seen == set(rows)


def test_hurst_matches_block_loop(spark, ev):
    from iot_etl_spark.plans.queries_analytics3 import HURST_BLOCK_SIZES

    hr = ev.epoch // 3600
    c = Counter(hr)
    mn, mx = int(hr.min()), int(hr.max())
    cnt = np.array([c.get(h, 0) for h in range(mn, mx + 1)], dtype=np.int64)
    ys = {}
    nblocks = {}
    for S in HURST_BLOCK_SIZES:
        nano_sum = 0
        nb = 0
        for b0 in range(0, len(cnt) - S + 1, S):
            blk = cnt[b0:b0 + S]
            if len(blk) < S:
                continue
            ssum, ssq = int(blk.sum()), int((blk**2).sum())
            if ssq * S <= ssum * ssum:
                continue
            pref = np.cumsum(blk)
            z = S * pref - np.arange(1, S + 1) * ssum
            rs = (float(z.max()) - float(z.min())) / math.sqrt(ssq * S - ssum * ssum)
            nano_sum += _ha_int(math.log2(rs) * 1e9)
            nb += 1
        ys[S] = nano_sum / 1e9 / nb
        nblocks[S] = nb
    slope = -0.3 * ys[16] - 0.1 * ys[32] + 0.1 * ys[64] + 0.3 * ys[128]
    rows = {r.block_size_hours: r for r in QUERIES["hurst_rs_exponent"](spark, SF_DIR).collect()}
    for S in HURST_BLOCK_SIZES:
        r = rows[S]
        assert r.n_blocks == nblocks[S], S
        assert abs(r.mean_log2_rs - ys[S]) < 1e-6, S
        assert abs(r.hurst_exponent - slope) < 1e-6, S


def test_crosscorr_matches_numpy(spark, ev):
    from iot_etl_spark.plans.queries_analytics3 import XCORR_LAGS

    d = ev[ev.event_type.isin(["click", "purchase"])]
    hr = d.epoch // 3600
    mn, mx = int(hr.min()), int(hr.max())
    x = np.zeros(mx - mn + 1, dtype=np.int64)
    y = np.zeros(mx - mn + 1, dtype=np.int64)
    for h, t in zip(hr, d.event_type):
        if t == "click":
            x[h - mn] += 1
        else:
            y[h - mn] += 1
    rows = {r.lag_hours: r for r in QUERIES["crosscorr_click_purchase"](spark, SF_DIR).collect()}
    for lag in XCORR_LAGS:
        if lag >= 0:
            xa, yb = x[: len(x) - lag], y[lag:]
        else:
            xa, yb = x[-lag:], y[: len(y) + lag]
        r = rows[lag]
        assert r.n_pairs == len(xa), lag
        assert abs(r.crosscorr - np.corrcoef(xa, yb)[0, 1]) < 1e-5, lag


def test_acf_pacf_matches_naive(spark, ev):
    from iot_etl_spark.plans.queries_analytics4 import ACF_MAX_LAG

    d = ev.copy()
    d["hr"] = d.ts.values.astype("datetime64[h]")
    d["vq"] = np.where(
        d.value.notna(),
        np.sign(d.value.fillna(0)) * np.floor(np.abs(d.value.fillna(0)) * 1e6 + 0.5),
        np.nan,
    )
    g = d.groupby("hr").agg(svq=("vq", "sum"), cnt=("vq", "size")).sort_index()
    yser = (g.svq.to_numpy() / g.cnt.to_numpy()) / 1e6
    n = len(yser)
    ybar = yser.sum() / n
    cdev = yser - ybar
    nums = [
        sum(_ha_int(cdev[i] * cdev[i + k] * 1e9) for i in range(n - k))
        for k in range(ACF_MAX_LAG + 1)
    ]
    r = [nums[k] / nums[0] for k in range(ACF_MAX_LAG + 1)]
    r1, r2, r3 = r[1], r[2], r[3]
    pacf2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    det3 = 1.0 * (1.0 - r1 * r1) - r1 * (r1 - r1 * r2) + r2 * (r1 * r1 - r2)
    pacf3 = (
        (1.0 * (r3 - r1 * r2)) - r1 * (r1 * r3 - r2 * r2) + r1 * (r1 * r1 - r2)
    ) / det3
    rows = {row.lag: row for row in QUERIES["acf_pacf_hourly"](spark, SF_DIR).collect()}
    for k in range(ACF_MAX_LAG + 1):
        row = rows[k]
        assert row.n_terms == n - k, k
        assert abs(row.acf - r[k]) < 1e-6, k
    assert abs(rows[1].pacf - r1) < 1e-6
    assert abs(rows[2].pacf - pacf2) < 1e-6
    assert abs(rows[3].pacf - pacf3) < 1e-6
    assert rows[4].pacf is None
