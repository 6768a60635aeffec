"""Environment-profile dispatch (profiles.py) — reference parity with
``db_connect.py:103-139``: prod/user credential tiers, dev→prod fallback
with a notice, unknown env raises, dotenv loses to real environ. Pure
policy suite: no Spark, no wall time, no os.environ mutation."""

from __future__ import annotations

import logging

import pytest

from rockefeller_spark.profiles import Profile, parse_dotenv, resolve_profile

BASE = {
    "DB_HOST": "db.internal",
    "DB_NAME": "cdc",
    "DB_SCHEMA_PROD": "ingest",
    "DB_USERNAME_PROD": "svc_prod",
    "DB_PASSWORD_PROD": "p-secret",
    "DB_SCHEMA_PUBLIC": "public",
    "DB_USERNAME_PUBLIC": "reader",
    "DB_PASSWORD_PUBLIC": "u-secret",
}


def _resolve(env=None, extra=None, **kw):
    environ = dict(BASE, **(extra or {}))
    kw.setdefault("dotenv_path", None)
    return resolve_profile(env, environ=environ, **kw)


def test_prod_and_user_read_their_own_tier():
    p = _resolve("prod")
    assert (p.db_user, p.db_schema) == ("svc_prod", "ingest")
    assert p.credential_tier == "prod"
    u = _resolve("user")
    assert (u.db_user, u.db_schema) == ("reader", "public")
    assert str(u.db_password) == "u-secret"


def test_dev_falls_back_to_prod_with_notice(caplog):
    with caplog.at_level(logging.INFO, logger="rockefeller_spark.profiles"):
        p = _resolve("dev")
    assert p.env == "dev" and p.credential_tier == "prod"
    assert p.db_user == "svc_prod"
    assert any("prod credentials" in r.message for r in caplog.records)


def test_unknown_env_raises():
    with pytest.raises(ValueError, match="invalid environment"):
        _resolve("staging")


def test_env_selection_precedence():
    # explicit arg > $ROCKEFELLER_ENV > 'user' default
    assert _resolve(extra={"ROCKEFELLER_ENV": "prod"}).env == "prod"
    assert _resolve("user", extra={"ROCKEFELLER_ENV": "prod"}).env == "user"
    assert _resolve().env == "user"           # least-privileged default


def test_engine_prefixed_var_beats_reference_shaped():
    p = _resolve("prod", extra={"ROCKEFELLER_DB_USERNAME_PROD": "svc_rk"})
    assert p.db_user == "svc_rk"


def test_dotenv_loses_to_real_environ(tmp_path):
    f = tmp_path / ".env"
    f.write_text("# comment\nexport DB_HOST='file.host'\nDB_NAME=filedb\n"
                 "DB_USERNAME_PROD=file_user\nDB_PASSWORD_PROD=\"fp\"\n")
    assert parse_dotenv(str(f))["DB_HOST"] == "file.host"
    p = resolve_profile("prod", environ={"DB_HOST": "real.host"},
                        dotenv_path=str(f))
    assert p.db_host == "real.host"           # environ wins
    assert p.db_name == "filedb"              # file fills the gaps
    assert p.db_user == "file_user"
    # a missing file is an empty overlay, not an error
    assert parse_dotenv(str(tmp_path / "nope")) == {}


def test_password_never_reprs():
    p = _resolve("prod")
    for s in (repr(p), repr(p.db_password), f"{p!r}"):
        assert "p-secret" not in s
    assert str(p.db_password) == "p-secret"   # the JDBC option map still works


def test_jdbc_source_wiring():
    src = _resolve("prod").jdbc_source("wal", num_partitions=4)
    opts = src.reader_options(since_lsn=10, max_lsn=50)
    assert opts["url"] == "jdbc:postgresql://db.internal/cdc"
    assert opts["user"] == "svc_prod" and opts["password"] == "p-secret"
    assert opts["options"] == "-c search_path=ingest"
    assert "lsn > 10" in opts["dbtable"] and "lsn <= 50" in opts["dbtable"]


def test_jdbc_url_requires_host_and_name():
    p = Profile(env="user", credential_tier="user")
    with pytest.raises(ValueError, match="db_host/db_name"):
        _ = p.jdbc_url


def test_backend_factory_by_warehouse_scheme():
    from rockefeller_spark import backends
    posix = Profile(env="user", credential_tier="user",
                    warehouse="/data/lake")
    s3 = Profile(env="prod", credential_tier="prod",
                 warehouse="s3://bucket/lake")
    filew = Profile(env="user", credential_tier="user",
                    warehouse="file:///data/lake")
    assert posix.backend_factory() is backends.PosixBackend
    assert s3.backend_factory() is backends.FakeObjectStoreBackend
    assert filew.backend_factory() is backends.PosixBackend


def test_resolve_path_two_slash_scheme_root_is_absolute():
    """ADVICE r8: s3://bucket/wh must not resolve relative to the cwd."""
    from rockefeller_spark.profiles import resolve_path
    p = Profile(env="prod", credential_tier="prod",
                warehouse="s3://bucket/wh")
    got = resolve_path(p, "conversations")
    assert got == "/bucket/wh/conversations"
    p3 = Profile(env="prod", credential_tier="prod",
                 warehouse="file:///abs/wh")
    assert resolve_path(p3, "t") == "/abs/wh/t"
