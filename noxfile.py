"""nox sessions mirroring the CI tiers (role of the reference's
noxfile.py:14-40, collapsed to this framework's single-backend
reality: one JAX stack instead of core/jax/pymc/pymc3 matrices).

The CI workflow (.github/workflows/ci.yml) runs the same commands
directly; nox is the local convenience for contributors.
"""

import nox

ALL_PYTHON_VS = ["3.11", "3.12"]
TEST_CMD = ["python", "-m", "pytest", "-q"]


@nox.session(python=ALL_PYTHON_VS)
def fast(session):
    """Suite minus the compile-heavy modules (the CI PR tier)."""
    session.install("-e", ".[test,checkpoint]")
    session.run(*TEST_CMD, "tests/", "-m", "not slow", *session.posargs)


@nox.session(python=ALL_PYTHON_VS)
def full(session):
    """Whole suite plus the bench smoke (the CI main/nightly tier)."""
    session.install("-e", ".[test,checkpoint]")
    session.run(*TEST_CMD, "tests/", *session.posargs)
    session.run("python", "bench.py", "--smoke")


@nox.session(python=ALL_PYTHON_VS)
def pymc(session):
    """PyMC bridge against the real dependency (gated elsewhere)."""
    session.install("-e", ".[test,pymc]")
    session.run(*TEST_CMD, "tests/test_pymc_support.py", *session.posargs)


@nox.session(python=ALL_PYTHON_VS)
def numpyro(session):
    """numpyro adapter against the real dependency."""
    session.install("-e", ".[test,numpyro]")
    session.run(*TEST_CMD, "tests/test_distributions.py", *session.posargs)


@nox.session
def lint(session):
    session.install("ruff")
    session.run("ruff", "check", "celerite2_tpu", "tests", "bench.py")
    session.run("ruff", "format", "--check", "celerite2_tpu", "tests")
