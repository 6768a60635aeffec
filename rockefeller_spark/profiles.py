"""Environment-profile dispatch: prod / dev / user credential resolution.

Reference parity: ``DatabaseConnect`` loads a ``.env`` file and match-cases
the environment name into per-environment credentials — prod and user get
their own secrets, dev logs a notice and falls back to prod
(``/root/reference/scripts/tools/db_connect.py:103-139``), an unknown name
raises. This module reproduces that dispatch for the engine's ingest seam
(:class:`~rockefeller_spark.sources.JdbcSource`) and its commit backend
(:mod:`~rockefeller_spark.backends`), with two engine-grade changes:

- everything is injected (the environ mapping, the dotenv path) so the
  dispatch is unit-testable and a driver process can hold several
  profiles at once — no mutation of ``os.environ``;
- secrets never repr: the profile masks its password everywhere a log or
  traceback could stringify it.

The profile is DRIVER-side configuration. Executors receive credentials
only inside the JDBC reader options Spark itself distributes — the same
boundary every Spark JDBC job has — so nothing here needs to be shipped
via ``--py-files`` config baking.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field
from typing import Any, Mapping

log = logging.getLogger(__name__)

# environment-variable names, reference-shaped (db_connect.py:115-137
# reads DB_SCHEMA_PROD / DB_USERNAME_PROD / DB_PASSWORD_PROD and the
# _PUBLIC trio, plus shared DB_NAME / DB_HOST)
_SUFFIX = {"prod": "PROD", "dev": "PROD", "user": "PUBLIC"}
ENV_VAR = "ROCKEFELLER_ENV"


def parse_dotenv(path: str) -> dict[str, str]:
    """Minimal ``.env`` reader: ``KEY=VALUE`` lines, ``#`` comments,
    optional ``export`` prefix, single/double quotes stripped. Returns a
    dict; the caller decides precedence (``load_dotenv`` semantics: a
    variable already present in the real environ wins)."""
    out: dict[str, str] = {}
    if not os.path.exists(path):
        return out
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export "):]
            k, _, v = line.partition("=")
            k, v = k.strip(), v.strip()
            if len(v) >= 2 and v[0] == v[-1] and v[0] in "\"'":
                v = v[1:-1]
            if k:
                out[k] = v
    return out


class _Secret(str):
    """A string that never prints its value. ``str(s)`` inside the JDBC
    option map still yields the real secret (Spark needs it); only
    ``repr`` — what logging, dataclass repr, and tracebacks use — masks."""
    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover - trivial
        return "'****'"


@dataclass(frozen=True)
class Profile:
    """Resolved per-environment configuration for one ingest target."""

    env: str                              # the REQUESTED env ('dev' stays 'dev')
    credential_tier: str                  # the tier serving it ('prod'/'user')
    db_host: str | None = None
    db_name: str | None = None
    db_schema: str | None = None
    db_user: str | None = None
    db_password: _Secret | None = None
    warehouse: str | None = None          # lake root for this environment
    extra: Mapping[str, str] = field(default_factory=dict)

    @property
    def jdbc_url(self) -> str:
        if not self.db_host or not self.db_name:
            raise ValueError(
                f"profile {self.env!r} has no db_host/db_name — set "
                f"ROCKEFELLER_DB_HOST and ROCKEFELLER_DB_NAME (or the "
                f"reference-shaped DB_HOST/DB_NAME)")
        return f"jdbc:postgresql://{self.db_host}/{self.db_name}"

    def jdbc_source(self, table: str, **kwargs: Any):
        """A :class:`~rockefeller_spark.sources.JdbcSource` carrying this
        profile's credentials and schema search path."""
        from rockefeller_spark.sources import JdbcSource
        options = dict(kwargs.pop("options", ()) or {})
        if self.db_user is not None:
            options.setdefault("user", self.db_user)
        if self.db_password is not None:
            options.setdefault("password", str(self.db_password))
        if self.db_schema:
            # psycopg2 parity: options=-c search_path=<schema>
            options.setdefault("options", f"-c search_path={self.db_schema}")
        return JdbcSource(self.jdbc_url, table, options=options, **kwargs)

    def backend_factory(self):
        """The commit backend this environment's warehouse needs: an
        object-store scheme routes through the conditional-PUT protocol,
        anything else is POSIX. (The sandbox's object store is the fake;
        a real S3/GCS backend drops into the same seam —
        :class:`~rockefeller_spark.backends.CommitBackend`.)"""
        from rockefeller_spark import backends
        w = self.warehouse or ""
        if "://" in w and not w.startswith("file://"):
            return backends.FakeObjectStoreBackend
        return backends.PosixBackend


def resolve_profile(env: str | None = None, *,
                    environ: Mapping[str, str] | None = None,
                    dotenv_path: str | None = ".env") -> Profile:
    """Resolve the active environment's profile.

    Precedence: explicit ``env`` argument → ``$ROCKEFELLER_ENV`` → ``user``
    (the least-privileged tier). Variables come from ``environ`` (defaults
    to ``os.environ``) overlaid ON TOP of the dotenv file — a real
    environment variable always beats the file, matching ``load_dotenv``.

    Dispatch (reference db_connect.py:117-134): ``prod`` and ``user`` read
    their own credential tier; ``dev`` is not provisioned and falls back
    to prod credentials with a notice; anything else raises ``ValueError``.
    """
    environ = os.environ if environ is None else environ
    merged: dict[str, str] = {}
    if dotenv_path:
        merged.update(parse_dotenv(dotenv_path))
    merged.update(environ)

    env = (env or merged.get(ENV_VAR) or "user").lower()
    if env not in _SUFFIX:
        raise ValueError(
            f"invalid environment {env!r}: use 'prod', 'dev' or 'user'")
    if env == "dev":
        log.info("dev environment is not provisioned; using prod credentials")
    tier = "prod" if env in ("prod", "dev") else "user"
    sfx = _SUFFIX[env]

    def get(name: str, suffixed: bool = False) -> str | None:
        # engine-prefixed name wins; the reference-shaped bare name is
        # accepted so a reference user's .env works unchanged
        full = f"{name}_{sfx}" if suffixed else name
        return merged.get(f"ROCKEFELLER_{full}") or merged.get(full)

    pw = get("DB_PASSWORD", suffixed=True)
    return Profile(
        env=env,
        credential_tier=tier,
        db_host=get("DB_HOST"),
        db_name=get("DB_NAME"),
        db_schema=get("DB_SCHEMA", suffixed=True),
        db_user=get("DB_USERNAME", suffixed=True),
        db_password=None if pw is None else _Secret(pw),
        warehouse=get("WAREHOUSE"),
        extra={k: v for k, v in merged.items()
               if k.startswith("ROCKEFELLER_OPT_")},
    )


# --------------------------------------------------------- job CLI glue

class ReadOnlyProfileError(PermissionError):
    """A write job was launched under the read-only 'user' tier."""


def add_cli_args(ap) -> None:
    """Install the profile flags on a job's ``argparse`` parser. Jobs
    stay profile-OPTIONAL: with no ``--env`` and no ``$ROCKEFELLER_ENV``
    the job runs exactly as before (explicit absolute paths, POSIX
    backend) — the reference's ``DB_MODE`` dispatch is end-to-end only
    when the operator opts in (``db_connect.py:103-139``)."""
    ap.add_argument("--env", default=None,
                    choices=("prod", "dev", "user"),
                    help="environment profile (overrides $ROCKEFELLER_ENV); "
                         "selects credentials, warehouse root and commit "
                         "backend — see rockefeller_spark.profiles")
    ap.add_argument("--dotenv", default=".env",
                    help="dotenv file overlaid UNDER the real environ")


def configure_job(args, job: str, *, writes: bool = True,
                  environ: Mapping[str, str] | None = None):
    """Resolve and ACTIVATE the profile for a job CLI, or return ``None``
    when no environment was requested (legacy direct-path mode).

    Activation = deployment-level wiring: the profile's commit backend
    becomes ``LakeTable.backend_factory`` (class-level, so every handle
    the job constructs — stream appliers, maintenance workers, mirrors —
    commits through the same protocol), and write jobs REFUSE the
    ``user`` tier (its credentials are the reference's read-only public
    pair; letting an ingest job run with them would fail halfway into a
    batch instead of at launch)."""
    env_req = getattr(args, "env", None)
    environ = os.environ if environ is None else environ
    if not env_req and ENV_VAR not in environ:
        return None
    prof = resolve_profile(env_req, environ=environ,
                           dotenv_path=getattr(args, "dotenv", ".env"))
    if writes and prof.credential_tier == "user":
        raise ReadOnlyProfileError(
            f"environment {prof.env!r} resolves to the read-only 'user' "
            f"credential tier, and {job} mutates the lake — run with "
            f"--env prod (or dev)")
    from rockefeller_spark.lake import LakeTable
    LakeTable.backend_factory = prof.backend_factory()
    log.info("profile %r active: tier=%s warehouse=%r backend=%s",
             prof.env, prof.credential_tier, prof.warehouse,
             LakeTable.backend_factory.__name__)
    return prof


def resolve_path(profile, path: str) -> str:
    """Resolve a job path argument against the active profile's
    warehouse root: relative names land under the warehouse (so the same
    ``--table conversations`` works in every environment), absolute
    paths and no-profile runs pass through unchanged."""
    if profile is None or path is None or os.path.isabs(path):
        return path
    root = profile.warehouse
    if not root:
        return path
    if "://" in root:
        # scheme selects the commit backend (Profile.backend_factory);
        # the sandbox realization of the store is still a local dir.
        # A two-slash root like scheme://bucket/wh leaves a RELATIVE
        # component — anchoring it at os.sep keeps tables from silently
        # resolving under the job's cwd
        root = root.split("://", 1)[1] or "/"
        if not os.path.isabs(root):
            root = os.sep + root
    return os.path.join(root, path)
