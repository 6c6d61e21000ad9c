"""Pure-numpy tests for the shard release-step math
(`streaming/stateful._sliding_release` / `._asof_release`) — the index
algebra behind all four shard-keyed stateful operators, checked against
brute-force per-user oracles without a SparkSession, including the
int64-overflow recursion path that fixture-scale streaming tests can
never reach (it needs multi-millennium time ranges)."""

from __future__ import annotations

import numpy as np
import pytest

from kafka_streams_learning_spark.streaming.stateful import (
    _asof_release,
    _sliding_release,
)


def _brute_sliding(ru, rt, tb_u, tb_t, lookback):
    cnt = np.empty(len(ru), "int64")
    for i, (u, t) in enumerate(zip(ru, rt)):
        pool = np.concatenate([tb_t[tb_u == u], rt[ru == u]])
        cnt[i] = int(((pool >= t - lookback) & (pool <= t)).sum())
    nb_u, nb_t = [], []
    for u in np.unique(ru):
        pool = np.sort(np.concatenate([tb_t[tb_u == u], rt[ru == u]]))
        last = rt[ru == u].max()
        keep = pool[pool >= last - lookback]
        nb_u.extend([u] * len(keep))
        nb_t.extend(keep.tolist())
    return cnt, np.asarray(nb_u, "int64"), np.asarray(nb_t, "int64")


def _brute_asof(ru, rt, ri, is_p, su_u, su_t, su_id):
    n = len(ru)
    lp_t = np.zeros(n, "int64")
    lp_id = np.zeros(n, "int64")
    vis = np.zeros(n, bool)
    for i in range(n):
        u, t = ru[i], rt[i]
        cand = [
            (su_t[j], su_id[j]) for j in range(len(su_u)) if su_u[j] == u
        ] + [
            (rt[j], ri[j]) for j in range(n) if ru[j] == u and is_p[j]
        ]
        cand = sorted(c for c in cand if c[0] < t)
        if cand:
            lp_t[i], lp_id[i] = cand[-1]
            vis[i] = True
    nu, nt, nid = [], [], []
    for u in np.unique(ru):
        cand = [
            (su_t[j], su_id[j]) for j in range(len(su_u)) if su_u[j] == u
        ] + [
            (rt[j], ri[j]) for j in range(n) if ru[j] == u and is_p[j]
        ]
        if cand:
            t, i_ = max(cand)
            nu.append(u), nt.append(t), nid.append(i_)
    return (
        lp_t, lp_id, vis,
        np.asarray(nu, "int64"), np.asarray(nt, "int64"),
        np.asarray(nid, "int64"),
    )


def _random_release(rng, n_users=6, n_rows=40, t_hi=1000):
    u = np.sort(rng.integers(0, n_users, n_rows).astype("int64"))
    t = rng.integers(0, t_hi, n_rows).astype("int64")
    i = rng.permutation(n_rows).astype("int64")
    order = np.lexsort((i, t, u))
    return u[order], t[order], i[order]


@pytest.mark.parametrize("seed", range(20))
def test_sliding_release_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    ru, rt, _ = _random_release(rng)
    n_buf = int(rng.integers(0, 15))
    tb_u = np.sort(rng.integers(0, 6, n_buf).astype("int64"))
    tb_t = rng.integers(0, 1000, n_buf).astype("int64")
    tb_order = np.lexsort((tb_t, tb_u))
    tb_u, tb_t = tb_u[tb_order], tb_t[tb_order]
    # buffers must belong to touched users only (the caller's contract)
    keep = np.isin(tb_u, np.unique(ru))
    tb_u, tb_t = tb_u[keep], tb_t[keep]
    lookback = int(rng.integers(1, 300))
    cnt, nb_u, nb_t = _sliding_release(ru, rt, tb_u, tb_t, lookback)
    ecnt, enb_u, enb_t = _brute_sliding(ru, rt, tb_u, tb_t, lookback)
    assert cnt.tolist() == ecnt.tolist()
    # buffers are per-user sets; compare as sorted pairs
    assert sorted(zip(nb_u, nb_t)) == sorted(zip(enb_u, enb_t))


@pytest.mark.parametrize("seed", range(20))
def test_asof_release_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    ru, rt, ri = _random_release(rng)
    is_p = rng.random(len(ru)) < 0.3
    n_su = int(rng.integers(0, 5))
    su_u = np.unique(rng.integers(0, 6, n_su).astype("int64"))
    su_u = su_u[np.isin(su_u, np.unique(ru))]
    su_t = rng.integers(0, 1000, len(su_u)).astype("int64")
    su_id = rng.integers(1000, 2000, len(su_u)).astype("int64")
    lp_t, lp_id, vis, nu, nt, nid = _asof_release(
        ru, rt, ri, is_p, su_u, su_t, su_id
    )
    elp_t, elp_id, evis, enu, ent, enid = _brute_asof(
        ru, rt, ri, is_p, su_u, su_t, su_id
    )
    assert vis.tolist() == evis.tolist()
    # lp_t/lp_id are meaningful ONLY where vis (the shard fn masks the
    # rest to NULL before emitting)
    assert lp_t[vis].tolist() == elp_t[evis].tolist()
    assert lp_id[vis].tolist() == elp_id[evis].tolist()
    assert list(zip(nu, nt, nid)) == list(zip(enu, ent, enid))


def test_sliding_release_overflow_splits_users():
    """Two users whose combined time range overflows rank x span: the
    helper must split per user and still return exact counts (each
    user's own range is tiny)."""
    far = 2**61
    ru = np.array([1, 1, 2, 2], "int64")
    rt = np.array([0, 50, far, far + 50], "int64")
    tb = np.empty(0, "int64")
    cnt, nb_u, nb_t = _sliding_release(ru, rt, tb, tb, 100)
    assert cnt.tolist() == [1, 2, 1, 2]
    assert sorted(zip(nb_u, nb_t)) == [
        (1, 0), (1, 50), (2, far), (2, far + 50)
    ]


def test_asof_release_overflow_splits_users():
    far = 2**61
    ru = np.array([1, 1, 2, 2], "int64")
    rt = np.array([0, 50, far, far + 50], "int64")
    ri = np.array([10, 11, 20, 21], "int64")
    is_p = np.array([True, False, True, False])
    e = np.empty(0, "int64")
    lp_t, lp_id, vis, nu, nt, nid = _asof_release(ru, rt, ri, is_p, e, e, e)
    assert vis.tolist() == [False, True, False, True]
    assert lp_id[vis].tolist() == [10, 20]
    assert list(zip(nu, nt, nid)) == [(1, 0, 10), (2, far, 20)]


def test_single_user_pathological_span_raises():
    ru = np.array([1, 1], "int64")
    rt = np.array([0, 2**62], "int64")
    tb = np.empty(0, "int64")
    with pytest.raises(OverflowError):
        _sliding_release(ru, rt, tb, tb, 10)


@pytest.mark.parametrize("seed", range(20))
def test_sliding_release_split_path_parity_with_unsplit(seed):
    """Forced-split parity (VERDICT r11 item 5): lowering the overflow
    threshold (`max_composite`) makes ORDINARY data take the exact
    user-split recursion — the deep-recursion path realistic fixtures
    never reach. The split result must be bit-identical to the unsplit
    one on the same inputs, and with a threshold this small the
    recursion bottoms out at 2-user leaves, exercising every split
    depth at once."""
    rng = np.random.default_rng(1000 + seed)
    ru, rt, _ = _random_release(rng, n_users=9, n_rows=60)
    n_buf = int(rng.integers(0, 20))
    tb_u = np.sort(rng.integers(0, 9, n_buf).astype("int64"))
    tb_t = rng.integers(0, 1000, n_buf).astype("int64")
    tb_order = np.lexsort((tb_t, tb_u))
    tb_u, tb_t = tb_u[tb_order], tb_t[tb_order]
    keep = np.isin(tb_u, np.unique(ru))
    tb_u, tb_t = tb_u[keep], tb_t[keep]
    lookback = int(rng.integers(1, 300))
    full = _sliding_release(ru, rt, tb_u, tb_t, lookback)
    # smallest legal threshold: a 2-user leaf needs (2+1) * span
    span = int(rt.max() - min(rt.min(), tb_t.min() if len(tb_t) else rt.min())
               ) + lookback + 2
    split = _sliding_release(
        ru, rt, tb_u, tb_t, lookback, max_composite=3 * span
    )
    assert split[0].tolist() == full[0].tolist()
    assert sorted(zip(split[1], split[2])) == sorted(zip(full[1], full[2]))


@pytest.mark.parametrize("seed", range(20))
def test_asof_release_split_path_parity_with_unsplit(seed):
    rng = np.random.default_rng(2000 + seed)
    ru, rt, ri = _random_release(rng, n_users=9, n_rows=60)
    is_p = rng.random(len(ru)) < 0.3
    n_su = int(rng.integers(0, 6))
    su_u = np.unique(rng.integers(0, 9, n_su).astype("int64"))
    su_u = su_u[np.isin(su_u, np.unique(ru))]
    su_t = rng.integers(0, 1000, len(su_u)).astype("int64")
    su_id = rng.integers(1000, 2000, len(su_u)).astype("int64")
    full = _asof_release(ru, rt, ri, is_p, su_u, su_t, su_id)
    lo = int(min(rt.min(), su_t.min())) if len(su_t) else int(rt.min())
    span = int(max(rt.max(), su_t.max() if len(su_t) else rt.max())) - lo + 2
    split = _asof_release(
        ru, rt, ri, is_p, su_u, su_t, su_id, max_composite=3 * span
    )
    f_vis, s_vis = full[2], split[2]
    assert s_vis.tolist() == f_vis.tolist()
    assert split[0][s_vis].tolist() == full[0][f_vis].tolist()
    assert split[1][s_vis].tolist() == full[1][f_vis].tolist()
    assert list(zip(split[3], split[4], split[5])) == \
        list(zip(full[3], full[4], full[5]))


def test_state_string_codec_roundtrip():
    """Dictionary-encoded string state blobs (r12): roundtrip through
    _pack_str/_unpack_str must be identity for empty, small-vocab (the
    dict path) and huge-vocab (the raw fallback) arrays — state bytes
    feed the release math, so a codec bug is a correctness bug."""
    from kafka_streams_learning_spark.streaming.stateful import (
        _pack_str,
        _unpack_str,
    )

    empty = np.empty(0, object)
    assert _unpack_str(_pack_str(empty)).tolist() == []
    small = np.asarray(["view", "purchase", "view", "click"] * 1000, object)
    out = _unpack_str(_pack_str(small))
    assert out.tolist() == small.tolist()
    # >= 65535 distinct values forces the raw-list fallback (tag "r")
    big = np.asarray([f"t{i}" for i in range(70000)], object)
    blob = _pack_str(big)
    import pickle

    assert pickle.loads(blob)[0] == "r"
    assert _unpack_str(blob).tolist() == big.tolist()
    # nulls fail AT PACK TIME (ADVICE r12): factorize would encode None
    # as -1, the uint16 cast would wrap it to 65535, and _unpack_str
    # would index past the vocab only AFTER the corrupt blob was
    # checkpointed; the raw fallback would instead stringify None —
    # divergent paths. A loud error beats either.
    import pytest

    with pytest.raises(ValueError, match="non-null"):
        _pack_str(np.asarray(["view", None, "click"], object))
