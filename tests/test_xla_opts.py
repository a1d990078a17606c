# SPCCT_XLA_OPTS parsing contract (utils/xla_opts.py): the env knob that
# carries per-program XLA compiler options through the tunneled backend.
import os

import pytest

from spcct_tpu.utils.xla_opts import xla_compiler_options


def test_unset_is_none(monkeypatch):
    monkeypatch.delenv("SPCCT_XLA_OPTS", raising=False)
    assert xla_compiler_options() is None


def test_empty_is_none(monkeypatch):
    monkeypatch.setenv("SPCCT_XLA_OPTS", "  ")
    assert xla_compiler_options() is None


def test_parses_pairs_and_strips(monkeypatch):
    monkeypatch.setenv(
        "SPCCT_XLA_OPTS",
        " xla_tpu_scoped_vmem_limit_kib=65536 , xla_tpu_x=false ,",
    )
    assert xla_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_x": "false",
    }


def test_value_may_contain_equals(monkeypatch):
    monkeypatch.setenv("SPCCT_XLA_OPTS", "k=a=b")
    assert xla_compiler_options() == {"k": "a=b"}


def test_missing_equals_raises(monkeypatch):
    monkeypatch.setenv("SPCCT_XLA_OPTS", "justakey")
    with pytest.raises(ValueError):
        xla_compiler_options()
