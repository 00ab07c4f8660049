"""Job-level 2PC staged-publish coordinator.

Reference semantics (engine/transaction_manager.go:21-41): ONE shared
transaction per connection, used by every component that touches that
connection, and at job end ALL transactions commit or roll back
together; Commit/Rollback retry transient failures up to
TxManagerMaxRetries (transaction_manager.go:13, :160-224), and using
the manager after it finished is an error
(ErrTransactionManagerFinished, :15).

Spark mapping: executors cannot share a driver-side DB transaction,
so the distributed write phase lands in ``<table>_staging`` (Spark
JDBC append or a DB-API batch — auto-commit, invisible to readers of
the target), and the job-end commit point becomes a real two-phase
publish driven from the driver:

* **phase 1 — prepare**: per connection, open one transaction and run
  every staged publish (``INSERT … SELECT`` from staging, ``DELETE``
  staging) WITHOUT committing. Any failure rolls back every open
  transaction — no target table on any connection is modified.
  Publish is APPEND-ONLY, matching the reference's shared-tx SQL
  destination (engine/sql_dest.go InsertBatch appends rows inside the
  job Tx — an incremental load into a populated table keeps the
  pre-existing rows). ``stage(..., replace=True)`` opts a table into
  DELETE-then-INSERT full replacement, an extension the reference
  does not have.
* **phase 2 — commit**: commit each connection's transaction with
  bounded retries (mirroring the reference's retry loop). A fault
  here is the classic 2PC in-doubt window; the reference accepts the
  same window and so do we.
"""

from __future__ import annotations

import time
from collections.abc import Callable

TX_MANAGER_MAX_RETRIES = 32  # transaction_manager.go:13


class TransactionManagerFinished(RuntimeError):
    """Analog of ErrTransactionManagerFinished
    (transaction_manager.go:15)."""


class JobTransactionManager:
    """Stages table publishes across any number of DB-API connections
    and commits them all-or-nothing at job end."""

    def __init__(
        self,
        max_retries: int = TX_MANAGER_MAX_RETRIES,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self._conns: dict[str, object] = {}
        # (conn_name, table) or (conn_name, table, replace)
        self._staged: list[tuple] = []
        self._finished = False
        self._max_retries = max_retries
        self._sleep = sleep

    # -- registration / staging --------------------------------------

    def register(self, name: str, conn: object) -> None:
        """Make a DB-API connection known (does not begin anything —
        transaction_manager.go:23-25)."""
        self._check_live()
        self._conns[name.lower()] = conn

    def conn(self, name: str):
        return self._conns[name.lower()]

    def stage(self, name: str, table: str, replace: bool = False) -> None:
        """Record that ``<table>_staging`` on connection ``name`` is
        loaded and must be published at the commit point. Publish
        appends (reference semantics); ``replace=True`` deletes the
        target's pre-existing rows first."""
        self._check_live()
        key = name.lower()
        if key not in self._conns:
            raise KeyError(f"connection not registered: {name!r}")
        if not any(s[0] == key and s[1] == table for s in self._staged):
            self._staged.append((key, table, replace))

    # -- commit point ------------------------------------------------

    def commit(self) -> None:
        """Publish every staged table, all-or-nothing."""
        self._check_live()
        self._finished = True
        # phase 1: run publish DML inside per-connection transactions
        prepared: list[str] = []
        try:
            for key, table, *rest in self._staged:
                # mark BEFORE executing so a connection whose publish
                # fails midway is rolled back along with the others
                if key not in prepared:
                    prepared.append(key)
                conn = self._conns[key]
                cur = conn.cursor()
                try:
                    if rest and rest[0]:  # replace=True: full refresh
                        cur.execute(f"DELETE FROM {table}")
                    cur.execute(
                        f"INSERT INTO {table} SELECT * FROM {table}_staging"
                    )
                    cur.execute(f"DELETE FROM {table}_staging")
                finally:
                    cur.close()
        except Exception:
            # roll back EVERY registered connection: managed direct
            # writes (connections.py) sit uncommitted on connections
            # that staged nothing
            for key in self._conns:
                self._retry(self._conns[key].rollback, key, "rollback")
            raise
        # phase 2: commit each connection, with retries. All registered
        # connections commit — not just the staged ones — because
        # tx-managed connections defer their per-block commits to this
        # point (transaction_manager.go:21-41 holds ONE transaction per
        # connection until job end).
        for key in self._conns:
            self._retry(self._conns[key].commit, key, "commit")

    def rollback(self) -> None:
        """Roll back every connection and clear staged data
        (best-effort, like the reference's retried Rollback)."""
        self._check_live()
        self._finished = True
        for key in self._conns:  # every connection, staged or not
            self._retry(self._conns[key].rollback, key, "rollback")
        for key, table, *_rest in self._staged:
            conn = self._conns[key]
            try:  # best-effort staging cleanup, own tiny tx
                cur = conn.cursor()
                cur.execute(f"DELETE FROM {table}_staging")
                conn.commit()
                cur.close()
            except Exception:
                pass

    # -- internals ---------------------------------------------------

    def _retry(self, fn: Callable[[], None], name: str, what: str) -> None:
        retries = 0
        while True:
            try:
                fn()
                return
            except Exception:
                retries += 1
                if retries > self._max_retries:
                    raise
                self._sleep(min(retries, 30))

    def _check_live(self) -> None:
        if self._finished:
            raise TransactionManagerFinished(
                "transaction manager is in a committed or rolled back "
                "state and can no longer provide new transactions"
            )


def dbapi_staged_writer(
    tx: JobTransactionManager, name: str, table: str
) -> Callable:
    """AQL connection write handler that stages rows into
    ``<table>_staging`` via the registered DB-API connection and
    records the publish with the coordinator.

    Driver-side by design: this is the test/SQLite path (the reference
    drains every row through one process too). The at-scale path is
    ``jdbc_sink(..., staging=True)`` for the distributed load plus
    ``tx.stage(name, table)`` for the publish."""

    def write(df, options) -> None:
        rows = [tuple(r) for r in df.collect()]
        if rows:
            conn = tx.conn(name)
            ph = ",".join(["?"] * len(rows[0]))
            conn.executemany(
                f"INSERT INTO {table}_staging VALUES ({ph})", rows
            )
        tx.stage(name, table)

    return write
