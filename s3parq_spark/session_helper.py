"""Redshift session shim (reference ``session_helper.py:10-186``).

The reference builds a SQLAlchemy engine from boto-acquired temporary
Redshift credentials (EC2-metadata probe, ``get_cluster_credentials``). Those
AWS dependencies are not present in this environment, so this shim keeps the
reference's *interface* — ``SessionHelper(region, cluster_id, host, port,
db_name, ec2_user)``, ``configure_session_helper()``, ``db_session_scope()``
— and executes through whichever backend is available:

1. an injected ``executor`` callable (tests; any DBAPI/JDBC bridge),
2. boto3 + sqlalchemy when importable (deployment parity path) — note
   this path connects EAGERLY, exactly like the reference
   (``session_helper.py:43-122``): with the libraries installed but no
   usable AWS credentials/cluster, ``configure_session_helper`` raises
   the boto error instead of silently recording (a publish that LOOKS
   registered but wasn't would be worse than a loud failure),
3. only when the libraries are MISSING, a dry-run recorder: SQL is
   captured on ``.executed`` so DDL generation stays fully testable
   without a cluster — the same strategy the reference's own test-suite
   uses (mocked sessions, ``tests/test_publish_redshift.py``).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable, List, Optional


class _Scope:
    def __init__(self, executor: Callable[[str], object]):
        self._executor = executor

    def execute(self, sql: str):
        return self._executor(sql)


class SessionHelper:
    def __init__(
        self,
        region: str,
        cluster_id: str,
        host: str,
        port: str,
        db_name: str,
        ec2_user: Optional[str] = None,
        executor: Optional[Callable[[str], object]] = None,
    ):
        self.region = region
        self.cluster_id = cluster_id
        self.host = host
        self.port = port
        self.db_name = db_name
        self.ec2_user = ec2_user
        self.configured = False
        self.executed: List[str] = []
        self._executor = executor

    def configure_session_helper(self) -> None:
        """Reference: EC2 probe → boto session → temp creds → SQLAlchemy
        engine (``session_helper.py:43-122``). Here: prefer the injected
        executor; else try the real AWS path; else record-only."""
        if self._executor is None:
            try:  # deployment parity path, only if the libs exist
                import boto3  # noqa: F401
                import sqlalchemy  # noqa: F401

                self._executor = self._build_aws_executor()
            except ImportError:
                self._executor = self.executed.append
        self.configured = True

    def _build_aws_executor(self) -> Callable[[str], object]:
        import boto3
        from sqlalchemy import create_engine, text

        client = boto3.client("redshift", region_name=self.region)
        creds = client.get_cluster_credentials(
            ClusterIdentifier=self.cluster_id,
            DbUser=self.ec2_user or "s3parq",
            DbName=self.db_name,
            AutoCreate=False,
        )
        engine = create_engine(
            f"postgresql://{creds['DbUser']}:{creds['DbPassword']}"
            f"@{self.host}:{self.port}/{self.db_name}",
            isolation_level="AUTOCOMMIT",
        )

        def run(sql: str):
            with engine.connect() as conn:
                return conn.execute(text(sql))

        return run

    @contextmanager
    def db_session_scope(self):
        """Reference's rollback-safe scope (``session_helper.py:124-186``);
        autocommit semantics mean scope exit is a no-op here too."""
        if not self.configured:
            self.configure_session_helper()
        yield _Scope(self._executor)
