"""SoftSpoken OT extension: pad correlation, flavor interop, bandwidth."""

import numpy as np
import pytest

from apsu_tpu.mpc.softspoken import softspoken_recv, softspoken_send
from tests.test_mpc import run_pair


@pytest.mark.parametrize("k", [2, 4, 8])
@pytest.mark.parametrize("m", [100, 1024])
def test_softspoken_random_ot(k, m):
    rng_s = np.random.default_rng(10 + k)
    rng_r = np.random.default_rng(20 + k)
    choices = np.random.default_rng(30 + k).integers(0, 2, size=m).astype(np.uint8)
    (y0, y1), yc = run_pair(
        lambda ch: softspoken_send(ch, m, rng_s, k=k),
        lambda ch: softspoken_recv(ch, choices, rng_r, k=k),
    )
    want = np.where(choices[:, None].astype(bool), y1, y0)
    np.testing.assert_array_equal(yc, want)
    # the unchosen pad must be unknown (differ everywhere)
    other = np.where(choices[:, None].astype(bool), y0, y1)
    assert not np.any(np.all(yc == other, axis=1))


def test_softspoken_bandwidth_below_iknp():
    """The u-matrix shrinks by ~k x: measure the receiver->sender bytes."""
    from apsu_tpu.mpc.duplex import pipe_pair
    import threading

    m = 4096

    def run(flavor_send, flavor_recv):
        ca, cb = pipe_pair()
        choices = np.random.default_rng(0).integers(0, 2, size=m).astype(np.uint8)
        out = {}

        def a():
            out["s"] = flavor_send(ca, m, np.random.default_rng(1))

        def b():
            out["r"] = flavor_recv(cb, choices, np.random.default_rng(2))

        ta, tb = threading.Thread(target=a), threading.Thread(target=b)
        ta.start(); tb.start(); ta.join(60); tb.join(60)
        return cb.bytes_sent  # receiver -> sender traffic

    from apsu_tpu.mpc.otext import iknp_recv, iknp_send

    iknp_bytes = run(iknp_send, iknp_recv)
    ss_bytes = run(
        lambda ch, m, rng: softspoken_send(ch, m, rng, k=8),
        lambda ch, c, rng: softspoken_recv(ch, c, rng, k=8),
    )
    # IKNP sends kappa*m bits of correction; softspoken k=8 sends m*kappa/8
    # plus the fixed GGM level ciphertexts — well under half at this size
    assert ss_bytes < iknp_bytes / 2
