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

    # -- sub-resource listings for the full entity hierarchy
    #    Project → Sample → {Spot, Area, Profile → ProfileSpot}
    #    (ref ``_database.py:461-598`` for the hierarchy; listing URLs
    #    follow this client's nested-resource convention) ---------------

    def areas(self, sample_id: int):
        """Integrated-area analyses of a sample (ref ``_database.py:727-735``)."""
        return self.get_json(f"/samples/{sample_id}/areas")

    def profiles(self, sample_id: int, label: str | None = None,
                 mineral: str | None = None):
        """Profiles (ordered traverses) of a sample, optionally filtered
        by label / mineral (ref ``_database.py:799-835``)."""
        items = self.get_json(f"/samples/{sample_id}/profiles")
        if mineral is not None:
            items = [p for p in items if p.get("mineral") == mineral]
        if label is not None:
            for p in items:
                if p.get("label") == label:
                    return p
            raise APIError(f"Profile {label!r} not found")
        return items

    def profile_spots(self, profile_id: int):
        """Ordered spots of one profile (ref ``_database.py:1013-1035``)."""
        return self.get_json(f"/profiles/{profile_id}/spots")


def pivot_records(records: list[dict], meta_cols: tuple[str, ...] = ()) -> list[dict]:
    """S4: one row per record — ``values`` dict exploded, metadata attached."""
    rows = []
    for rec in records:
        row = dict(rec.get("values", {}))
        row["id"] = rec.get("id")
        if "sample" in rec:
            row["sample"] = rec["sample"]
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


def _post_batches(api: PetroAPI, path: str, payloads, batch_size: int) -> int:
    """Stream payload dicts to ``POST path`` in fixed-size batches —
    API-bound, so rows flow through the driver; the expensive part
    (scrubbing, projection) already ran distributed upstream."""
    batch: list[dict] = []
    n = 0
    for payload in payloads:
        batch.append(payload)
        if len(batch) >= batch_size:
            api.request("POST", path, payload=batch)
            n += len(batch)
            batch = []
    if batch:
        api.request("POST", path, payload=batch)
        n += len(batch)
    return n


def _payload_rows(df, value_cols: list[str], meta_cols: list[str]):
    """Scrubbed DataFrame rows → ``{"values": {...}, <meta>...}`` dicts."""
    for row in df.toLocalIterator():
        d = row.asDict()
        yield {
            "values": {c: d[c] for c in value_cols if d[c] is not None},
            **{c: d[c] for c in meta_cols},
        }


def write_spots(df, api: PetroAPI, sample: str, batch_size: int = 100) -> int:
    """S5: bulk-create spots from a DataFrame — API-bound, so rows stream
    through the driver in batches (ref ``_database.py:686-725``)."""
    from petropandas_spark import core

    scrubbed = scrub_for_write(df)
    fcols = [c for c in scrubbed.columns if core.is_formula(c)]
    meta = [c for c in scrubbed.columns if not core.is_formula(c)]
    return _post_batches(
        api, f"/samples/{sample}/spots",
        _payload_rows(scrubbed, fcols, meta), batch_size,
    )


def write_areas(df, api: PetroAPI, sample: str, label_col: str = "label",
                batch_size: int = 100) -> int:
    """S5: bulk-create integrated areas — ``[{label, values}]`` payloads
    with the same pre-write scrub (ref ``create_areas``,
    ``_database.py:766-795``)."""
    from petropandas_spark import core

    scrubbed = scrub_for_write(df)
    fcols = [c for c in scrubbed.columns if core.is_formula(c)]
    meta = [label_col] if label_col in scrubbed.columns else []
    return _post_batches(
        api, f"/samples/{sample}/areas",
        _payload_rows(scrubbed, fcols, meta), batch_size,
    )


def create_profile(api: PetroAPI, sample: str, label: str,
                   mineral: str | None = None):
    """S5: create one profile container (ref ``create_profile``,
    ``_database.py:837-851``); spots are added with
    :func:`write_profile_spots`."""
    r = api.request("POST", f"/samples/{sample}/profiles",
                    payload={"label": label, "mineral": mineral})
    if not getattr(r, "ok", False):
        raise APIError(f"Profile not created (HTTP {r.status_code})")
    return r.json()


def write_profile_spots(df, api: PetroAPI, profile_id: int,
                        index_col: str = "position",
                        batch_size: int = 100) -> int:
    """S5: bulk-create ordered profile spots — ``[{index, values}]``
    payloads; ``index_col`` carries the traverse order (Spark rows have
    no implicit order, so the position must be an explicit column — ref
    ``Profile.create_spots``, ``_database.py:1075-1109``)."""
    from pyspark.sql import functions as F

    from petropandas_spark import core

    if index_col not in df.columns:
        raise ValueError(
            f"profile spots need an explicit order column {index_col!r}"
        )
    scrubbed = scrub_for_write(df).orderBy(F.col(index_col))
    fcols = [c for c in scrubbed.columns if core.is_formula(c)]

    def payloads():
        for row in scrubbed.toLocalIterator():
            d = row.asDict()
            yield {
                "index": d[index_col],
                "values": {c: d[c] for c in fcols if d[c] is not None},
            }

    return _post_batches(
        api, f"/profiles/{profile_id}/spots", payloads(), batch_size,
    )


ENTITY_KINDS = ("project", "sample", "spot", "area", "profile",
                "profilespot")


def _entity_url(kind: str, entity_id) -> str:
    if kind not in ENTITY_KINDS:
        raise ValueError(f"unknown entity kind {kind!r}; "
                         f"expected one of {ENTITY_KINDS}")
    return f"/{kind}s/{entity_id}"


def update_entity(api: PetroAPI, kind: str, entity_id, payload: dict):
    """Entity UPDATE (ref ``_Entity.update``, ``_database.py:455-459``)."""
    r = api.request("PUT", _entity_url(kind, entity_id), payload=payload)
    if not getattr(r, "ok", False):
        raise APIError(f"{kind} {entity_id} not updated "
                       f"(HTTP {r.status_code})")
    return r.json()


def delete_entity(api: PetroAPI, kind: str, entity_id):
    """Entity DELETE (ref ``_Entity.delete``, ``_database.py:449-453``)."""
    r = api.request("DELETE", _entity_url(kind, entity_id))
    if not getattr(r, "ok", False):
        raise APIError(f"{kind} {entity_id} not deleted "
                       f"(HTTP {r.status_code})")
    return r.json()


# ---------------------------------------------------------------------------
# Area / Profile fetch → DataFrame
# ---------------------------------------------------------------------------


def areas_df(spark, api: PetroAPI, sample_id, **filters):
    """Areas of a sample → DataFrame (ref ``Sample.areas``,
    ``_database.py:727-735``): ``values`` pivoted to columns + ``label``."""
    rows = pivot_records(api.areas(sample_id), ("label",))
    df = spark.createDataFrame(rows).orderBy("id")
    for col, val in filters.items():
        df = df.filter(df[col] == val)
    return df


def profile_spots_df(spark, api: PetroAPI, sample_id, label: str,
                     mineral: str | None = None, sample: str | None = None):
    """One profile's ordered spots → DataFrame with an explicit
    ``position`` column (Spark has no implicit row order; SURVEY §1.1
    "Profile").  The profile's ``label``/``mineral`` are stamped onto
    every spot row exactly as the reference does
    (``Profile.spots``, ``_database.py:1013-1035``)."""
    prof = api.profiles(sample_id, label=label, mineral=mineral)
    recs = api.profile_spots(prof["id"])
    rows = []
    for rec in recs:
        row = dict(rec.get("values", {}))
        row["id"] = rec.get("id")
        row["position"] = rec.get("index")
        row["label"] = prof.get("label")
        row["mineral"] = prof.get("mineral")
        if sample is not None:
            row["sample"] = sample
        rows.append(row)
    return spark.createDataFrame(rows).orderBy("position")


def mineral_data_df(spark, api: PetroAPI, project_id, mineral: str):
    """All analyses of one mineral across a project — plain spots tagged
    ``kind='spot'`` unioned with every matching profile's spots tagged
    ``kind='profile'`` (ref ``Project.mineral_data`` /
    ``Sample.mineral_data``, ``_database.py:561-580,870-884``).  The
    fetch is driver-side (entity metadata is small); the returned frame
    is a normal distributed DataFrame."""
    from pyspark.sql import functions as F

    frames = []
    for s in api.samples(project_id):
        spot_rows = [
            r for r in pivot_records(api.spots(s["id"]),
                                     ("label", "mineral"))
            if r.get("mineral") == mineral
        ]
        for r in spot_rows:
            r.setdefault("sample", s.get("name"))
        if spot_rows:
            frames.append(
                spark.createDataFrame(spot_rows)
                .withColumn("kind", F.lit("spot"))
            )
        for prof in api.profiles(s["id"], mineral=mineral):
            pdf = profile_spots_df(
                spark, api, s["id"], prof["label"],
                sample=s.get("name"),
            )
            if pdf.take(1):
                frames.append(pdf.withColumn("kind", F.lit("profile")))
    if not frames:
        raise APIError(f"No data found for mineral {mineral!r}")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
