"""Upload authorization hooks.

The reference authorized uploads with a Postgres users-table lookup that
failed closed on any error (embedding_gen.py:282-309). The TPU build keeps
authorization as an async hook on the upload path (SURVEY.md C13: "keep a
pluggable auth hook"); implementations here:

- ``allow_all_auth``  — accepts any non-empty user id (dev default).
- ``UserFileAuth``    — file-backed user table (one ``user_id[:email]`` per
  line); fail-closed: unreadable file or missing entry denies. The file is
  re-stat'd per check so user admin needs no restart.
- ``HTTPAuth``        — delegates to an external auth service (the shape a
  real deployment with a SQL/IDP backend plugs into).
- ``PostgresAuth``    — the reference's users-table lookup, re-implemented
  over a from-scratch wire-protocol client (serving/pgwire.py); fail-closed
  on connect/auth/query errors exactly like embedding_gen.py:282-309.
"""

from __future__ import annotations

import os
import re
import urllib.parse
from typing import Optional

from sqe_tpu.utils.logging import get_logger

try:
    import httpx
except Exception:  # pragma: no cover
    httpx = None

log = get_logger("serving.auth")

# The reference's auth lookup was a parameterized SQL query with no injection
# surface (embedding_gen.py:296-304); the HTTP delegate must match that:
# only ids from this safe set are ever interpolated into a URL path.
_SAFE_USER_ID = re.compile(r"^[A-Za-z0-9_-]{1,128}$")


async def allow_all_auth(user_id: str) -> bool:
    return bool(user_id.strip())


class UserFileAuth:
    """Fail-closed file-backed user table."""

    def __init__(self, path: str):
        self.path = path
        self._mtime = 0.0
        self._users: set[str] = set()

    def _refresh(self) -> bool:
        try:
            mtime = os.path.getmtime(self.path)
        except OSError:
            log.error("auth user file %s unreadable; denying", self.path)
            return False
        if mtime != self._mtime:
            users = set()
            with open(self.path, encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if line and not line.startswith("#"):
                        users.add(line.split(":", 1)[0])
            self._users = users
            self._mtime = mtime
        return True

    async def __call__(self, user_id: str) -> bool:
        if not user_id.strip():
            return False
        if not self._refresh():
            return False  # fail closed, like the reference's conn-error path
        return user_id in self._users


class PostgresAuth:
    """Users-table lookup over the wire-level PG client (pgwire.py).

    Behavioral parity with the reference's check_user_authorized_in_postgres
    (embedding_gen.py:282-309): a fresh connection per check, the
    parameterized query ``SELECT id, email FROM users WHERE id = $1``, and
    authorization only when the row exists with BOTH id and email non-empty
    after strip. Any error on any step denies (fail closed)."""

    QUERY = "SELECT id, email FROM users WHERE id = $1;"

    def __init__(self, host: str, port: int = 5432, database: str = "postgres",
                 user: str = "postgres", password: str = "",
                 timeout_s: float = 5.0, ssl: str = "prefer"):
        self.host, self.port = host, port
        self.database, self.user, self.password = database, user, password
        self.timeout_s = timeout_s
        self.ssl = ssl

    @classmethod
    def from_env(cls) -> "PostgresAuth":
        """Reference env names (embedding_gen.py:30-35); POSTGRES_SSLMODE
        maps disable/prefer/require onto the wire client's SSLRequest
        negotiation (pgwire.PGWireClient)."""
        return cls(
            host=os.getenv("POSTGRES_HOST", "localhost"),
            port=int(os.getenv("POSTGRES_PORT", "5432")),
            database=os.getenv("POSTGRES_DB", "postgres"),
            user=os.getenv("POSTGRES_USER", "postgres"),
            password=os.getenv("POSTGRES_PASSWORD", ""),
            ssl=os.getenv("POSTGRES_SSLMODE", "prefer"),
        )

    async def __call__(self, user_id: str) -> bool:
        from sqe_tpu.serving.pgwire import PGError, PGWireClient

        if not user_id.strip():
            return False
        client = PGWireClient(timeout_s=self.timeout_s, ssl=self.ssl)
        try:
            await client.connect(self.host, self.port, self.user,
                                 self.password, self.database)
            row = await client.fetchrow(self.QUERY, [user_id])
            if row is None or len(row) < 2:
                return False
            return all(c is not None and str(c).strip() for c in row[:2])
        except PGError as exc:
            log.error("postgres auth error: %s; denying", exc)
            return False
        except Exception as exc:  # noqa: BLE001 — fail closed, always
            log.error("postgres auth unexpected error: %s; denying", exc)
            return False
        finally:
            await client.close()


class HTTPAuth:
    """Asks an external service: GET {base_url}/users/{id} -> 200 = allowed."""

    def __init__(self, base_url: str, timeout_s: float = 5.0,
                 bearer_token: Optional[str] = None):
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s
        self.bearer_token = bearer_token

    async def __call__(self, user_id: str) -> bool:
        if httpx is None or not user_id.strip():
            return False
        # Reject ids that could redirect the authorization check ('/', '..',
        # '?', '#', ...) before they reach the URL; percent-encode the rest.
        if not _SAFE_USER_ID.match(user_id):
            log.warning("auth: rejecting unsafe user id %r", user_id[:64])
            return False
        headers = (
            {"Authorization": f"Bearer {self.bearer_token}"}
            if self.bearer_token else {}
        )
        try:
            async with httpx.AsyncClient() as client:
                resp = await client.get(
                    f"{self.base_url}/users/"
                    + urllib.parse.quote(user_id, safe=""),
                    headers=headers, timeout=self.timeout_s,
                )
                return resp.status_code == 200
        except Exception as exc:  # noqa: BLE001
            log.error("auth service error: %s; denying", exc)
            return False
