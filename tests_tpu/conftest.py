"""TPU-backend test tier (VERDICT r2 item 3).

These tests run ON THE REAL TPU (plus the host CPU backend for
agreement checks) — the CPU suite under tests/ never exercises the
Pallas kernel, the tiered matmul precision, or TPU↔CPU agreement,
which is exactly the failure class that produced round 2's silent
bf16 corruption.  Driver invocation:

    python -m pytest tests_tpu/ -q

The default `pytest tests/` CPU CI is unaffected (separate tree).
Keep both backends visible: axon (the TPU) first = default, cpu second
for same-process cross-backend comparisons.
"""

import jax
import pytest

try:
    jax.config.update("jax_platforms", "axon,cpu")
except RuntimeError:
    pass  # backend already initialized (e.g. re-entrant run)


def pytest_collection_modifyitems(config, items):
    try:
        backend = jax.default_backend()
    except RuntimeError:
        # No axon plugin on this host at all — default_backend() itself
        # raises during initialization, which would otherwise error out
        # collection instead of skipping.
        backend = "cpu"
    if backend == "cpu":
        skip = pytest.mark.skip(reason="TPU tier needs a TPU backend")
        for item in items:
            item.add_marker(skip)
