"""PetroDB REST source (SURVEY.md §2.1 S2-S5): JWT client, parallel fetch,
records→DataFrame pivot, CRUD sink — Spark-first.

Components:
  * :class:`PetroAPI` — S2: auth (``/token``), bearer GET/POST/PUT/DELETE,
    single 401 re-auth retry, read-only guard on mutating verbs (ref
    ``/root/reference/src/petropandas/_database.py:176-303``).  The HTTP
    transport is injectable, so tests run without a network and the class
    imports without ``requests`` installed.
  * :class:`PetroDBDataSource` — S3 as a Spark 4 Python DataSource: one
    input partition per sample, each partition fetches its own
    sub-resources executor-side (the reference fans out with 8 driver
    threads; partition-parallel reads scale with the cluster instead).
  * :func:`records_df` — S4 pivot: JSON ``values`` dicts → columns, plus
    ``sample``/metadata columns, kwarg equality filters, sort by id.
  * :func:`write_spots` — S5 sink: ``toLocalIterator`` batches → POST,
    with the reference's ``_zero_negative_nan`` pre-write scrub as a
    Spark expression.
"""

from __future__ import annotations

import json
from typing import Any, Callable

MUTATING = {"POST", "PUT", "DELETE"}


class AuthError(Exception):
    pass


class APIError(Exception):
    pass


class ReadOnlyError(Exception):
    pass


def _requests_transport():
    import requests

    session = requests.Session()

    def call(method: str, url: str, **kw):
        return getattr(session, method.lower())(url, **kw)

    return call


class PetroAPI:
    """S2: minimal authenticated JSON client with injectable transport.

    ``transport(method, url, headers=..., json=..., data=..., timeout=...)``
    must return an object with ``.ok``, ``.status_code`` and ``.json()``.
    """

    def __init__(self, api_url: str | None = None,
                 username: str | None = None, password: str | None = None,
                 timeout: int = 30, read_only: bool = True,
                 transport: Callable | None = None):
        import os

        # reference credential resolution (ref ``_database.py:309-340``):
        # explicit args, then PETRODBAPI/PETRODBUSER/PETRODBPASSWORD env
        # vars, then a ``.env`` file in the working directory
        dotenv: dict[str, str] = {}
        if None in (api_url, username, password) and os.path.exists(".env"):
            for line in open(".env"):
                line = line.strip()
                if line and not line.startswith("#") and "=" in line:
                    k, _, v = line.partition("=")
                    dotenv[k.strip()] = v.strip().strip("'\"")

        def resolve(value, env_key):
            if value is not None:
                return value
            value = os.environ.get(env_key, dotenv.get(env_key))
            if value is None:
                raise AuthError(f"{env_key} not provided and not in env/.env")
            return value

        api_url = resolve(api_url, "PETRODBAPI")
        username = resolve(username, "PETRODBUSER")
        password = resolve(password, "PETRODBPASSWORD")
        self._transport = transport or _requests_transport()
        self._api_url = api_url.rstrip("/")
        self._username = username
        self._password = password
        self._timeout = timeout
        self._read_only = read_only
        self._token: str | None = None
        self._login()

    def _login(self) -> None:
        r = self._transport(
            "POST", f"{self._api_url}/token",
            data={"username": self._username, "password": self._password},
            timeout=self._timeout,
        )
        if not getattr(r, "ok", False):
            raise AuthError(f"Authentication failed (HTTP {r.status_code})")
        self._token = r.json().get("access_token")

    def request(self, method: str, path: str, payload=None):
        method = method.upper()
        if self._read_only and method in MUTATING:
            raise ReadOnlyError(
                f"Cannot {method} {path} — client is read-only"
            )
        kw: dict[str, Any] = {
            "headers": {"Authorization": f"Bearer {self._token}"},
            "timeout": self._timeout,
        }
        if payload is not None:
            kw["json"] = payload
        r = self._transport(method, f"{self._api_url}/api{path}", **kw)
        if getattr(r, "status_code", None) == 401:
            self._login()  # single re-auth retry (ref :265-271)
            kw["headers"] = {"Authorization": f"Bearer {self._token}"}
            r = self._transport(method, f"{self._api_url}/api{path}", **kw)
        return r

    def get_json(self, path: str):
        r = self.request("GET", path)
        if not getattr(r, "ok", False):
            raise APIError(f"GET {path} failed (HTTP {r.status_code})")
        return r.json()

    # -- high-level listings (ref ``_database.py:370-430``) ------------------

    def projects(self, name: str | None = None):
        """All projects, or the one named *name*."""
        items = self.get_json("/projects")
        if name is None:
            return items
        for p in items:
            if p.get("name") == name:
                return p
        raise APIError(f"Project {name!r} not found")

    def samples(self, project_id: int):
        return self.get_json(f"/projects/{project_id}/samples")

    def spots(self, sample_id: int):
        return self.get_json(f"/samples/{sample_id}/spots")


def pivot_records(records: list[dict], meta_cols: tuple[str, ...] = ()) -> list[dict]:
    """S4: one row per record — ``values`` dict exploded, metadata attached."""
    rows = []
    for rec in records:
        row = dict(rec.get("values", {}))
        row["id"] = rec.get("id")
        row["sample"] = rec.get("sample")
        for c in meta_cols:
            if c in rec:
                row[c] = rec[c]
        rows.append(row)
    return rows


def records_df(spark, api: PetroAPI, project_path: str,
               meta_cols: tuple[str, ...] = ("label", "mineral"),
               **filters):
    """S4 driver fetch → Spark DataFrame with kwarg equality filters."""
    records = api.get_json(project_path)
    rows = pivot_records(records, meta_cols)
    df = spark.createDataFrame(rows).orderBy("id")
    for col, val in filters.items():
        df = df.filter(df[col] == val)
    return df


# ---------------------------------------------------------------------------
# S3: Spark 4 Python DataSource — one partition per sample
# ---------------------------------------------------------------------------

try:
    from pyspark.sql.datasource import (
        DataSource, DataSourceReader, InputPartition,
    )

    class _SamplePartition(InputPartition):
        def __init__(self, sample: str):
            self.sample = sample

    class PetroDBReader(DataSourceReader):
        def __init__(self, options, schema):
            self.options = options
            self._schema = schema

        def partitions(self):
            samples = json.loads(self.options.get("samples", "[]"))
            return [_SamplePartition(s) for s in samples]

        def read(self, partition):
            mock = self.options.get("mock_data")
            if mock is not None:
                data = json.loads(mock).get(partition.sample, [])
            else:  # pragma: no cover - live network path
                api = PetroAPI(
                    self.options["api_url"], self.options["username"],
                    self.options["password"],
                )
                data = api.get_json(
                    f"/samples/{partition.sample}/spots"
                )
            fields = [f.name for f in self._schema.fields]
            for rec in data:
                row = dict(rec.get("values", {}))
                row["id"] = rec.get("id")
                row["sample"] = partition.sample
                row["label"] = rec.get("label")
                row["mineral"] = rec.get("mineral")
                yield tuple(row.get(f) for f in fields)

    class PetroDBDataSource(DataSource):
        """``spark.read.format("petrodb")`` after
        ``spark.dataSource.register(PetroDBDataSource)``.

        Options: ``samples`` (JSON list — one input partition each),
        ``api_url``/``username``/``password`` for live reads, or
        ``mock_data`` (JSON {sample: [records]}) for offline tests.
        The analysis-value schema is caller-declared (column names are
        data-dependent in EMPA exports).
        """

        @classmethod
        def name(cls):
            return "petrodb"

        def schema(self):
            return self.options.get(
                "schema",
                "id BIGINT, sample STRING, label STRING, mineral STRING",
            )

        def reader(self, schema):
            return PetroDBReader(self.options, schema)

    HAS_DATASOURCE = True
except ImportError:  # pragma: no cover - pre-Spark-4 fallback
    HAS_DATASOURCE = False


# ---------------------------------------------------------------------------
# S5: CRUD sink
# ---------------------------------------------------------------------------


def scrub_for_write(df):
    """Reference's ``_zero_negative_nan`` pre-write scrub (ref
    ``_database.py:76-82``): non-positive / NaN analysis values → NULL."""
    from pyspark.sql import functions as F

    from petropandas_spark import core

    out = df
    for c in df.columns:
        if core.is_formula(c):
            col = F.col(f"`{c}`")
            out = out.withColumn(
                c, F.when(col.isNull() | (col <= 0) | F.isnan(col), None)
                .otherwise(col)
            )
    return out


def write_spots(df, api: PetroAPI, sample: str, batch_size: int = 100) -> int:
    """S5: bulk-create spots from a DataFrame — API-bound, so rows stream
    through the driver in batches (ref ``_database.py:686-725``)."""
    from petropandas_spark import core

    scrubbed = scrub_for_write(df)
    fcols = [c for c in scrubbed.columns if core.is_formula(c)]
    meta = [c for c in scrubbed.columns if not core.is_formula(c)]
    batch: list[dict] = []
    n = 0
    for row in scrubbed.toLocalIterator():
        d = row.asDict()
        payload = {
            "values": {c: d[c] for c in fcols if d[c] is not None},
            **{c: d[c] for c in meta},
        }
        batch.append(payload)
        if len(batch) >= batch_size:
            api.request("POST", f"/samples/{sample}/spots", payload=batch)
            n += len(batch)
            batch = []
    if batch:
        api.request("POST", f"/samples/{sample}/spots", payload=batch)
        n += len(batch)
    return n
