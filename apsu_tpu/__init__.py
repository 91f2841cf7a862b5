"""apsu_tpu — a TPU-native unbalanced Private Set Union framework.

A from-scratch JAX/XLA/Pallas implementation of the unbalanced-PSU protocol of
eprint 2022/653 (the protocol implemented by the C++ reference
``real-world-cryprography/APSU``): the BFV homomorphic core runs as batched
uint32 RNS kernels on TPU, the cuckoo-hashed database lives as dense HBM
tensors sharded over a ``jax.sharding.Mesh``, and the OT/OPRF/PEQT machinery
runs host-side.

Party naming follows the reference (which inverted APSI's names):

* ``Sender`` holds the SMALL set, encrypts query powers, decrypts results and
  finally transfers its non-matching items via OT.
* ``Receiver`` holds the LARGE set (the preprocessed ``ReceiverDB``) and
  evaluates the matching polynomials homomorphically.
"""

__version__ = "0.1.0"

from apsu_tpu.core.params import PSUParams  # noqa: F401


def __getattr__(name):
    """Lazy top-level API (keeps `import apsu_tpu` light)."""
    if name in ("run_psu", "run_psu_mpc", "PsuResult"):
        from apsu_tpu.api import protocol

        return getattr(protocol, name)
    if name in ("Sender", "Receiver"):
        from apsu_tpu.api import parties

        return getattr(parties, name)
    if name == "ReceiverDB":
        from apsu_tpu.db.receiver_db import ReceiverDB

        return ReceiverDB
    if name == "BfvContext":
        from apsu_tpu.core.bfv import BfvContext

        return BfvContext
    raise AttributeError(name)
