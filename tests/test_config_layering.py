"""Layered configuration (reference analogue: Dynaconf dev/test/prod
environments + envvar overrides, reference config.py:22-30)."""

import textwrap

import pytest

from databricks_pdf_ocr_spark.config import ExtractConfig, load_config


def _toml(tmp_path):
    p = tmp_path / "settings.toml"
    p.write_text(textwrap.dedent("""
        [default]
        max_pages_per_doc = 123
        retry_backoff_s = 0.5

        [dev]
        n_buckets = 10

        [prod]
        n_buckets = 4096
        salt_spans = true
    """))
    return str(p)


def test_explicitly_named_missing_file_is_loud(monkeypatch):
    monkeypatch.setenv("ENGINE_SETTINGS_FILE", "/nonexistent/nope.toml")
    with pytest.raises(FileNotFoundError):
        load_config()


def test_layer_precedence(tmp_path, monkeypatch):
    cfg_file = _toml(tmp_path)
    monkeypatch.delenv("ENGINE_ENV", raising=False)

    dev = load_config(config_file=cfg_file)          # env defaults to dev
    assert dev.max_pages_per_doc == 123              # [default]
    assert dev.n_buckets == 10                       # [dev]
    assert dev.salt_spans is False                   # dataclass default

    prod = load_config(env="prod", config_file=cfg_file)
    assert prod.n_buckets == 4096 and prod.salt_spans is True
    assert prod.max_pages_per_doc == 123             # [default] inherited

    monkeypatch.setenv("ENGINE_ENV", "prod")         # env var selects layer
    assert load_config(config_file=cfg_file).n_buckets == 4096

    monkeypatch.setenv("ENGINE_N_BUCKETS", "77")     # envvar beats TOML
    assert load_config(config_file=cfg_file).n_buckets == 77

    # explicit overrides beat everything; None means "not set"
    cfg = load_config(config_file=cfg_file,
                      overrides={"n_buckets": 5, "max_pages_per_doc": None})
    assert cfg.n_buckets == 5 and cfg.max_pages_per_doc == 123


def test_envvar_coercion(monkeypatch):
    monkeypatch.setenv("ENGINE_SALT_SPANS", "true")
    monkeypatch.setenv("ENGINE_RETRY_BACKOFF_S", "2.5")
    monkeypatch.setenv("ENGINE_SPECIFIC_DOC_IDS", "a,b,c")
    cfg = load_config(config_file=None)
    assert cfg.salt_spans is True
    assert cfg.retry_backoff_s == 2.5
    assert cfg.specific_doc_ids == ("a", "b", "c")
    assert isinstance(cfg, ExtractConfig)
