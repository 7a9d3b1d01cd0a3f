"""Environment-workaround utilities."""

import pytest

from genomeassembler_dev_tpu.utils.compat import flaky_backend_retry


def test_retries_buffer_error():
    calls = {"n": 0}

    @flaky_backend_retry(attempts=3, delay=0.0)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ValueError(
                "INVALID_ARGUMENT: Execution supplied 2 buffers but compiled "
                "program expected 3 buffers"
            )
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3


def test_retries_generic_tpu_backend_error():
    """The second observed relay flake: a non-ValueError runtime error on
    the output fetch of a cached program (seen mid-study, round 3)."""
    calls = {"n": 0}

    @flaky_backend_retry(attempts=3, delay=0.0)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError(
                "INVALID_ARGUMENT: TPU backend error (InvalidArgument).")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 2


def test_other_errors_pass_through():
    @flaky_backend_retry(attempts=3, delay=0.0)
    def boom():
        raise ValueError("unrelated")

    with pytest.raises(ValueError, match="unrelated"):
        boom()


def test_gives_up_after_attempts():
    @flaky_backend_retry(attempts=2, delay=0.0)
    def always():
        raise ValueError(
            "INVALID_ARGUMENT: Execution supplied 1 buffers but compiled "
            "program expected 2 buffers"
        )

    with pytest.raises(ValueError, match="buffers"):
        always()
