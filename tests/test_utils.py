"""Utility-module coverage: ini config, logger, profiling, NaN guards."""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idccrn_vae_tpu.utils.config import IniConfig, get_opt, load_ini
from idccrn_vae_tpu.utils.debug import check_finite, checkify_finite
from idccrn_vae_tpu.utils.logger import get_logger
from idccrn_vae_tpu.utils.profiling import StepTimer, log_memory


def test_ini_config_preserves_case(tmp_path):
    p = tmp_path / "c.ini"
    p.write_text("[User]\nCamelCaseKey = Value\nsaved_root = /x\n")
    cfg = load_ini(str(p))
    # the reference's myconf keeps option case (read_config.py:15-19)
    assert cfg.get("User", "CamelCaseKey") == "Value"
    assert get_opt(cfg, "User", "missing", "fallback") == "fallback"
    with pytest.raises(FileNotFoundError):
        load_ini(str(tmp_path / "nope.ini"))


def test_logger_file_and_stream(tmp_path):
    path = str(tmp_path / "log.txt")
    lg = get_logger(path, 1)
    lg.info("hello %d", 42)
    for h in lg.handlers:
        h.flush()
    assert "hello 42" in open(path).read()
    lg2 = get_logger("", 2)
    assert isinstance(lg2, logging.Logger)


def test_step_timer_summary():
    t = StepTimer("s")
    for _ in range(3):
        with t:
            sum(range(1000))
    s = t.summary()
    assert s["count"] == 3 and s["total_s"] >= 0


def test_log_memory_keys():
    out = log_memory()
    assert "host_rss_mb" in out


def test_check_finite_raises():
    ok = {"a": np.ones(3), "b": [np.zeros(2)]}
    check_finite(ok, "ok")
    bad = {"a": np.array([1.0, np.nan])}
    with pytest.raises(RuntimeError, match="NaN/Inf"):
        check_finite(bad, "bad")


def test_checkify_finite_under_jit():
    from jax.experimental import checkify

    @jax.jit
    def f(x):
        err, out = checkify.checkify(
            lambda y: checkify_finite(y, "x") * 2.0)(x)
        return err, out

    err, out = f(jnp.ones(3))
    # no error for finite input
    err.throw()
    np.testing.assert_allclose(np.asarray(out), 2.0)
    err2, _ = f(jnp.array([1.0, jnp.inf, 0.0]))
    with pytest.raises(Exception, match="NaN/Inf"):
        err2.throw()
