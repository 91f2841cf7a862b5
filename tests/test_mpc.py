"""Two-thread unit tests for the MPC primitives (Kunlun-test style: spawn
both roles, compare against the plain functionality —
/root/reference/Kunlun/test/ pattern, SURVEY §4.3)."""

import threading

import numpy as np
import pytest

from apsu_tpu.mpc import ec
from apsu_tpu.mpc.baseot import base_ot_recv, base_ot_send
from apsu_tpu.mpc.duplex import pipe_pair
from apsu_tpu.mpc.kkrt import KkrtReceiver, KkrtSender
from apsu_tpu.mpc.otext import (
    iknp_recv,
    iknp_send,
    ot_recv_chosen,
    ot_recv_onesided,
    ot_send_chosen,
    ot_send_onesided,
)
from apsu_tpu.mpc.peqt import ddh_peqt_receiver, ddh_peqt_sender


def run_pair(fa, fb):
    """Run two protocol roles on a duplex pair; returns (ra, rb)."""
    ca, cb = pipe_pair()
    out = {}
    err = []

    def wrap(name, fn, ch):
        try:
            out[name] = fn(ch)
        except Exception as e:  # pragma: no cover
            err.append(e)

    ta = threading.Thread(target=wrap, args=("a", fa, ca))
    tb = threading.Thread(target=wrap, args=("b", fb, cb))
    ta.start(); tb.start(); ta.join(60); tb.join(60)
    if err:
        raise err[0]
    return out["a"], out["b"]


def test_base_ot():
    n = 64
    rng_s = np.random.default_rng(1)
    rng_r = np.random.default_rng(2)
    choices = np.random.default_rng(3).integers(0, 2, size=n).astype(np.uint8)
    (k0, k1), kc = run_pair(
        lambda ch: base_ot_send(ch, n, rng_s),
        lambda ch: base_ot_recv(ch, choices, rng_r),
    )
    want = np.where(choices[:, None].astype(bool), k1, k0)
    np.testing.assert_array_equal(kc, want)
    # the unchosen key must differ
    other = np.where(choices[:, None].astype(bool), k0, k1)
    assert not np.any(np.all(kc == other, axis=1))


def test_iknp_random_ot():
    m = 500
    choices = np.random.default_rng(3).integers(0, 2, size=m).astype(np.uint8)
    (y0, y1), yc = run_pair(
        lambda ch: iknp_send(ch, m, np.random.default_rng(1)),
        lambda ch: iknp_recv(ch, choices, np.random.default_rng(2)),
    )
    want = np.where(choices[:, None].astype(bool), y1, y0)
    np.testing.assert_array_equal(yc, want)
    other = np.where(choices[:, None].astype(bool), y0, y1)
    assert not np.any(np.all(yc == other, axis=1))


def test_chosen_ot():
    m = 300
    rng = np.random.default_rng(0)
    m0 = rng.integers(0, 256, size=(m, 16), dtype=np.uint8)
    m1 = rng.integers(0, 256, size=(m, 16), dtype=np.uint8)
    choices = rng.integers(0, 2, size=m).astype(np.uint8)
    _, got = run_pair(
        lambda ch: ot_send_chosen(ch, m0, m1, np.random.default_rng(1)),
        lambda ch: ot_recv_chosen(ch, choices, np.random.default_rng(2)),
    )
    want = np.where(choices[:, None].astype(bool), m1, m0)
    np.testing.assert_array_equal(got, want)


def test_onesided_ot():
    m = 200
    rng = np.random.default_rng(0)
    m1 = rng.integers(0, 256, size=(m, 16), dtype=np.uint8)
    choices = rng.integers(0, 2, size=m).astype(np.uint8)
    _, got = run_pair(
        lambda ch: ot_send_onesided(ch, m1, np.random.default_rng(1)),
        lambda ch: ot_recv_onesided(ch, choices, np.random.default_rng(2)),
    )
    sel = choices.astype(bool)
    np.testing.assert_array_equal(got[sel], m1[sel])
    assert not np.any(np.all(got[~sel] == m1[~sel], axis=1))


def test_kkrt_oprf():
    n_slots = 128
    rng = np.random.default_rng(0)
    inputs = rng.integers(0, 1 << 64, size=(n_slots, 2), dtype=np.uint64)

    sender, receiver = run_pair(
        lambda ch: KkrtSender(ch, n_slots, np.random.default_rng(1)),
        lambda ch: KkrtReceiver(ch, inputs, np.random.default_rng(2)),
    )
    slots = np.arange(n_slots)
    # receiver's PRFs == sender's evaluation on the same pairs
    rv = receiver.eval(inputs, slots)
    sv = sender.eval(inputs, slots)
    np.testing.assert_array_equal(rv, sv)
    # sender can evaluate other items; outputs differ from receiver's
    other = rng.integers(0, 1 << 64, size=(n_slots, 2), dtype=np.uint64)
    so = sender.eval(other, slots)
    assert not np.any(np.all(so == rv, axis=1))
    # slot binding: same item at different slot -> different PRF
    sv2 = sender.eval(inputs, (slots + 1) % n_slots)
    assert not np.any(np.all(sv2 == sv, axis=1))
    # receiver cannot evaluate unbound inputs
    with pytest.raises(ValueError):
        receiver.eval(other, slots)


def test_ddh_peqt():
    C, S = 3, 40
    rng = np.random.default_rng(0)
    sender_m = rng.integers(0, 256, size=(C, S, 16), dtype=np.uint8)
    receiver_m = rng.integers(0, 256, size=(C, S, 16), dtype=np.uint8)
    # plant matches at some columns (in some row)
    match_cols = [3, 7, 21, 39]
    for j in match_cols:
        c = rng.integers(0, C)
        receiver_m[c, j] = sender_m[c, j]
    perm, matched = run_pair(
        lambda ch: ddh_peqt_sender(ch, sender_m, np.random.default_rng(1)),
        lambda ch: ddh_peqt_receiver(ch, receiver_m, np.random.default_rng(2)),
    )
    # receiver's matched[j] refers to column perm[j]
    want = np.zeros(S, dtype=bool)
    for j in range(S):
        want[j] = perm[j] in match_cols
    np.testing.assert_array_equal(matched, want)


def test_benes_any_routing():
    """Arbitrary-size router realizes every permutation (clear evaluation)."""
    from apsu_tpu.mpc.osn import benes_route, benes_topology

    rng = np.random.default_rng(0)
    for n in list(range(2, 40)) + [64, 100, 409, 819, 6552]:
        trials = 25 if n < 40 else 2
        for _ in range(trials):
            perm = rng.permutation(n).astype(np.int64)
            cnt, per_level = benes_topology(n)
            settings = benes_route(perm)
            assert len(settings) == cnt
            v = np.arange(n)
            for a, b, idx in per_level:
                sw = settings[idx].astype(bool)
                va, vb = v[a].copy(), v[b].copy()
                v[a] = np.where(sw, vb, va)
                v[b] = np.where(sw, va, vb)
            np.testing.assert_array_equal(v, perm)
    # the 16M-4096 endgame width routes natively (no pow2 pad): fewer
    # switches than the 8192-wide network round 1 used
    n6552, _ = benes_topology(6552)
    n8192, _ = benes_topology(8192)
    assert n6552 < 0.8 * n8192


def test_osn_share_translation():
    from apsu_tpu.mpc.osn import osn_holder, osn_programmer

    rng = np.random.default_rng(0)
    n = 37  # non-power-of-two: exercises the arbitrary-size network
    values = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
    perm = rng.permutation(n).astype(np.int64)
    share_p, share_h = run_pair(
        lambda ch: osn_programmer(ch, perm, np.random.default_rng(1)),
        lambda ch: osn_holder(ch, values, np.random.default_rng(2)),
    )
    np.testing.assert_array_equal(share_p ^ share_h, values[perm])


@pytest.mark.slow
def test_osn_share_translation_6552():
    """Production endgame width (16M-4096: 6552 columns), native size."""
    from apsu_tpu.mpc.osn import osn_holder, osn_programmer

    rng = np.random.default_rng(0)
    n = 6552
    values = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
    perm = rng.permutation(n).astype(np.int64)
    share_p, share_h = run_pair(
        lambda ch: osn_programmer(ch, perm, np.random.default_rng(1)),
        lambda ch: osn_holder(ch, values, np.random.default_rng(2)),
    )
    np.testing.assert_array_equal(share_p ^ share_h, values[perm])


def test_osn_peqt():
    from apsu_tpu.mpc.osn_peqt import osn_peqt_db_side, osn_peqt_query_side

    C, S = 3, 40
    rng = np.random.default_rng(0)
    qm = rng.integers(0, 256, size=(C, S, 16), dtype=np.uint8)
    dm = rng.integers(0, 256, size=(C, S, 16), dtype=np.uint8)
    match_cols = [0, 5, 17, 39]
    for j in match_cols:
        c = rng.integers(0, C)
        dm[c, j] = qm[c, j]
    perm, matched = run_pair(
        lambda ch: osn_peqt_query_side(ch, qm, np.random.default_rng(1)),
        lambda ch: osn_peqt_db_side(ch, dm, np.random.default_rng(2)),
    )
    want = np.array([perm[j] in match_cols for j in range(S)])
    np.testing.assert_array_equal(matched, want)
