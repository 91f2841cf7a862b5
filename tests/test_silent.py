"""Silent OT extension (mpc/silent.py): correctness + bandwidth break-even.

The reference exposes SilentOT as a Benes switch-OT flavor
(common/apsu/permute/apsu_OSNSender.cpp:19-49); here the silent extension
is a size-dispatched backend of otext.ot_ext_* (selected above 2^19 OTs).
"""

import threading

import numpy as np
import pytest

from apsu_tpu.mpc.duplex import pipe_pair
from apsu_tpu.mpc.silent import silent_params, silent_recv, silent_send


def run_pair(fa, fb):
    ca, cb = pipe_pair()
    out = [None, None]
    err = []

    def run(i, f, ch):
        try:
            out[i] = f(ch)
        except Exception as e:  # pragma: no cover
            err.append(e)

    ta = threading.Thread(target=run, args=(0, fa, ca))
    tb = threading.Thread(target=run, args=(1, fb, cb))
    ta.start(), tb.start(), ta.join(), tb.join()
    if err:
        raise err[0]
    return out[0], out[1], ca, cb


@pytest.mark.parametrize("m", [5000, 20000])
def test_silent_rot_correctness(m):
    rng = np.random.default_rng(0)
    choices = rng.integers(0, 2, size=m).astype(np.uint8)
    (y0, y1), y, _, _ = run_pair(
        lambda ch: silent_send(ch, m, np.random.default_rng(1)),
        lambda ch: silent_recv(ch, choices, np.random.default_rng(2)),
    )
    want = np.where(choices[:, None].astype(bool), y1, y0)
    np.testing.assert_array_equal(y, want)
    # the two pads differ everywhere (receiver learns exactly one)
    assert (y0 != y1).any(axis=1).all()


def test_silent_bandwidth_beats_softspoken_at_scale():
    """Measured bytes-on-wire: silent's fixed setup + 1 bit/OT undercuts
    SoftSpoken's 2 B/OT above the dispatch threshold."""
    from apsu_tpu.mpc.softspoken import softspoken_recv, softspoken_send

    m = 1 << 19
    choices = np.random.default_rng(0).integers(0, 2, size=m).astype(np.uint8)
    _, _, ca, _ = run_pair(
        lambda ch: silent_send(ch, m, np.random.default_rng(1)),
        lambda ch: silent_recv(ch, choices, np.random.default_rng(2)),
    )
    silent_bytes = ca.bytes_sent + ca.bytes_received
    _, _, cb, _ = run_pair(
        lambda ch: softspoken_send(ch, m, np.random.default_rng(1), k=8),
        lambda ch: softspoken_recv(ch, choices, np.random.default_rng(2), k=8),
    )
    ss_bytes = cb.bytes_sent + cb.bytes_received
    assert silent_bytes < ss_bytes, (silent_bytes, ss_bytes)
    print(f"m=2^19: silent {silent_bytes}B vs softspoken {ss_bytes}B")


def test_silent_params_regular():
    for m in (10_000, 100_000, 1 << 20, 4_000_000):
        n, kb, t, d = silent_params(m)
        assert n >= m and n % t == 0
        nb = n // t
        assert nb & (nb - 1) == 0 and nb >= 2
        assert kb >= 2048 and d == 11
