"""PetroDB REST source: auth/retry/read-only client semantics, the
records pivot, the partition-per-sample DataSource, and the CRUD sink —
all offline via an injectable mock transport."""

from __future__ import annotations

import json

import pytest

from petropandas_spark.sources import petrodb


class FakeResponse:
    def __init__(self, payload, status=200):
        self.status_code = status
        self.ok = 200 <= status < 300
        self._payload = payload

    def json(self):
        return self._payload


class FakeTransport:
    """Scriptable transport: records calls, serves token + data routes."""

    def __init__(self, data=None, expire_after: int | None = None):
        self.calls = []
        self.data = data or {}
        self.expire_after = expire_after
        self.tokens = 0

    def __call__(self, method, url, **kw):
        self.calls.append((method, url, kw))
        if url.endswith("/token"):
            self.tokens += 1
            return FakeResponse({"access_token": f"tok{self.tokens}"})
        n_data_calls = sum(1 for m, u, _ in self.calls if "/api" in u)
        if self.expire_after is not None and n_data_calls == self.expire_after:
            return FakeResponse({"detail": "expired"}, status=401)
        return FakeResponse(self.data.get(url.split("/api")[-1], []))


SPOTS = [
    {"id": 2, "sample": "S1", "label": "b", "mineral": "Grt",
     "values": {"SiO2": 37.0, "FeO": 28.0}},
    {"id": 1, "sample": "S1", "label": "a", "mineral": "Grt",
     "values": {"SiO2": 38.0, "FeO": 27.0}},
    {"id": 3, "sample": "S1", "label": "c", "mineral": "Cpx",
     "values": {"SiO2": 52.0, "FeO": 8.0}},
]


def _api(**kw):
    return petrodb.PetroAPI(
        "http://db", "u", "p", transport=kw.pop("transport"), **kw
    )


class TestClient:
    def test_login_and_get(self):
        t = FakeTransport(data={"/projects/1/spots": SPOTS})
        api = _api(transport=t)
        out = api.get_json("/projects/1/spots")
        assert len(out) == 3
        # bearer header attached
        method, url, kw = t.calls[-1]
        assert kw["headers"]["Authorization"] == "Bearer tok1"

    def test_reauth_on_401(self):
        t = FakeTransport(data={"/x": [1]}, expire_after=1)
        api = _api(transport=t)
        out = api.get_json("/x")
        assert out == [1]
        assert t.tokens == 2  # re-authenticated once

    def test_read_only_guard(self):
        api = _api(transport=FakeTransport())
        with pytest.raises(petrodb.ReadOnlyError):
            api.request("POST", "/samples/S1/spots", payload=[])

    def test_bad_login(self):
        class Bad(FakeTransport):
            def __call__(self, method, url, **kw):
                return FakeResponse({}, status=403)

        with pytest.raises(petrodb.AuthError):
            _api(transport=Bad())


class TestRecordsDF:
    def test_pivot_filter_sort(self, spark):
        t = FakeTransport(data={"/projects/1/spots": SPOTS})
        api = _api(transport=t)
        df = petrodb.records_df(spark, api, "/projects/1/spots")
        pdf = df.toPandas()
        assert list(pdf["id"]) == [1, 2, 3]  # sorted by id
        assert set(pdf.columns) >= {"SiO2", "FeO", "sample", "label", "mineral"}
        grt = petrodb.records_df(
            spark, api, "/projects/1/spots", mineral="Grt"
        ).toPandas()
        assert list(grt["id"]) == [1, 2]


@pytest.mark.skipif(not petrodb.HAS_DATASOURCE, reason="needs Spark 4 datasource")
class TestDataSource:
    def test_partition_per_sample(self, spark):
        mock = {
            "S1": [{"id": 1, "label": "a", "mineral": "Grt", "values": {}}],
            "S2": [{"id": 2, "label": "b", "mineral": "Grt", "values": {}},
                   {"id": 3, "label": "c", "mineral": "Cpx", "values": {}}],
        }
        spark.dataSource.register(petrodb.PetroDBDataSource)
        df = (
            spark.read.format("petrodb")
            .option("samples", json.dumps(["S1", "S2"]))
            .option("mock_data", json.dumps(mock))
            .load()
        )
        assert df.rdd.getNumPartitions() == 2
        pdf = df.toPandas().sort_values("id")
        assert list(pdf["sample"]) == ["S1", "S2", "S2"]


class TestSink:
    def test_write_spots_scrubs_and_batches(self, spark):
        import pandas as pd

        t = FakeTransport()
        api = _api(transport=t, read_only=False)
        pdf = pd.DataFrame({
            "label": ["p1", "p2", "p3"],
            "SiO2": [37.0, -1.0, 38.0],
            "FeO": [28.0, float("nan"), 27.0],
        })
        n = petrodb.write_spots(
            spark.createDataFrame(pdf), api, "S1", batch_size=2
        )
        assert n == 3
        posts = [c for c in t.calls if c[0] == "POST" and "/api" in c[1]]
        assert len(posts) == 2  # 2 + 1 batches
        first_batch = posts[0][2]["json"]
        # scrub: negative/NaN values dropped from the payload
        assert first_batch[1]["values"] == {}
        assert first_batch[0]["values"] == {"SiO2": 37.0, "FeO": 28.0}


class TestCredentialResolution:
    """Constructor resolves api_url/user/password from env vars then .env
    (ref _database.py:309-340)."""

    def test_env_var_resolution(self, monkeypatch):
        monkeypatch.setenv("PETRODBAPI", "https://db.example")
        monkeypatch.setenv("PETRODBUSER", "u")
        monkeypatch.setenv("PETRODBPASSWORD", "p")
        t = FakeTransport()
        api = petrodb.PetroAPI(transport=t)
        assert api._api_url == "https://db.example"
        assert t.tokens == 1

    def test_dotenv_fallback(self, monkeypatch, tmp_path):
        for k in ("PETRODBAPI", "PETRODBUSER", "PETRODBPASSWORD"):
            monkeypatch.delenv(k, raising=False)
        monkeypatch.chdir(tmp_path)
        (tmp_path / ".env").write_text(
            "PETRODBAPI='https://dotenv.example'\n"
            "PETRODBUSER=du\nPETRODBPASSWORD=dp\n"
        )
        api = petrodb.PetroAPI(transport=FakeTransport())
        assert api._api_url == "https://dotenv.example"

    def test_missing_credentials_raise(self, monkeypatch, tmp_path):
        for k in ("PETRODBAPI", "PETRODBUSER", "PETRODBPASSWORD"):
            monkeypatch.delenv(k, raising=False)
        monkeypatch.chdir(tmp_path)  # no .env here
        with pytest.raises(petrodb.AuthError):
            petrodb.PetroAPI(transport=FakeTransport())


class TestHighLevelListings:
    def _api(self):
        t = FakeTransport(data={
            "/projects": [{"id": 1, "name": "alpha"}, {"id": 2, "name": "beta"}],
            "/projects/1/samples": [{"id": 10, "name": "S1"}],
            "/samples/10/spots": [{"id": 100, "label": "a"}],
        })
        return petrodb.PetroAPI("https://x", "u", "p", transport=t)

    def test_projects_listing_and_by_name(self):
        api = self._api()
        assert [p["name"] for p in api.projects()] == ["alpha", "beta"]
        assert api.projects("beta")["id"] == 2
        with pytest.raises(petrodb.APIError):
            api.projects("nope")

    def test_samples_and_spots(self):
        api = self._api()
        assert api.samples(1)[0]["name"] == "S1"
        assert api.spots(10)[0]["label"] == "a"


AREAS = [
    {"id": 21, "label": "A2", "values": {"SiO2": 50.0, "FeO": 10.0}},
    {"id": 20, "label": "A1", "values": {"SiO2": 49.0, "FeO": 11.0}},
]
PROFILES = [
    {"id": 7, "label": "grt-rim-core", "mineral": "Grt"},
    {"id": 8, "label": "pl-traverse", "mineral": "Pl"},
]
PROFILE_SPOTS = [
    {"id": 71, "index": 2, "values": {"SiO2": 37.5, "FeO": 27.5}},
    {"id": 70, "index": 1, "values": {"SiO2": 37.0, "FeO": 28.0}},
]


def _hier_transport():
    return FakeTransport(data={
        "/projects/1/samples": [{"id": 10, "name": "S1"}],
        "/samples/10/spots": SPOTS,
        "/samples/10/areas": AREAS,
        "/samples/10/profiles": PROFILES,
        "/profiles/7/spots": PROFILE_SPOTS,
        "/profiles/8/spots": [],
    })


class TestAreasProfiles:
    def test_areas_listing_and_df(self, spark):
        api = _api(transport=_hier_transport())
        assert [a["label"] for a in api.areas(10)] == ["A2", "A1"]
        pdf = petrodb.areas_df(spark, api, 10).toPandas()
        assert list(pdf["id"]) == [20, 21]  # sorted by id
        assert set(pdf.columns) >= {"SiO2", "FeO", "label"}
        one = petrodb.areas_df(spark, api, 10, label="A1").toPandas()
        assert list(one["id"]) == [20]

    def test_profiles_listing_search_and_mineral_filter(self):
        api = _api(transport=_hier_transport())
        assert [p["id"] for p in api.profiles(10)] == [7, 8]
        assert [p["id"] for p in api.profiles(10, mineral="Grt")] == [7]
        assert api.profiles(10, label="pl-traverse")["id"] == 8
        with pytest.raises(petrodb.APIError):
            api.profiles(10, label="nope")

    def test_profile_spots_df_ordered_and_stamped(self, spark):
        api = _api(transport=_hier_transport())
        pdf = petrodb.profile_spots_df(
            spark, api, 10, "grt-rim-core", sample="S1"
        ).toPandas()
        assert list(pdf["position"]) == [1, 2]  # traverse order
        assert set(pdf["label"]) == {"grt-rim-core"}
        assert set(pdf["mineral"]) == {"Grt"}
        assert set(pdf["sample"]) == {"S1"}

    def test_mineral_data_unions_spots_and_profiles(self, spark):
        api = _api(transport=_hier_transport())
        pdf = petrodb.mineral_data_df(spark, api, 1, "Grt").toPandas()
        assert set(pdf["kind"]) == {"spot", "profile"}
        assert len(pdf[pdf["kind"] == "spot"]) == 2      # Grt spots only
        assert len(pdf[pdf["kind"] == "profile"]) == 2   # profile 7 spots
        with pytest.raises(petrodb.APIError):
            petrodb.mineral_data_df(spark, api, 1, "Zrn")


class TestEntityCrud:
    def test_write_areas_scrubs_and_posts(self, spark):
        import pandas as pd

        t = _hier_transport()
        api = _api(transport=t, read_only=False)
        pdf = pd.DataFrame({
            "label": ["A1", "A2", "A3"],
            "SiO2": [49.0, -2.0, 50.0],
        })
        n = petrodb.write_areas(
            spark.createDataFrame(pdf), api, "10", batch_size=2
        )
        assert n == 3
        posts = [c for c in t.calls
                 if c[0] == "POST" and "/samples/10/areas" in c[1]]
        assert len(posts) == 2
        assert posts[0][2]["json"][0] == {
            "values": {"SiO2": 49.0}, "label": "A1"
        }
        assert posts[0][2]["json"][1]["values"] == {}  # negative scrubbed

    def test_create_profile_and_write_profile_spots(self, spark):
        import pandas as pd

        t = _hier_transport()
        api = _api(transport=t, read_only=False)
        petrodb.create_profile(api, "10", "rim-core", mineral="Grt")
        creates = [c for c in t.calls
                   if c[0] == "POST" and "/samples/10/profiles" in c[1]]
        assert creates[0][2]["json"] == {
            "label": "rim-core", "mineral": "Grt"
        }
        pdf = pd.DataFrame({
            "position": [2, 1],
            "SiO2": [37.5, 37.0],
        })
        n = petrodb.write_profile_spots(
            spark.createDataFrame(pdf), api, 7
        )
        assert n == 2
        posts = [c for c in t.calls
                 if c[0] == "POST" and "/profiles/7/spots" in c[1]]
        batch = posts[0][2]["json"]
        assert [b["index"] for b in batch] == [1, 2]  # explicit order col
        assert batch[0]["values"] == {"SiO2": 37.0}
        with pytest.raises(ValueError):
            petrodb.write_profile_spots(
                spark.createDataFrame(pd.DataFrame({"SiO2": [1.0]})), api, 7
            )

    def test_update_and_delete_entity(self):
        t = _hier_transport()
        api = _api(transport=t, read_only=False)
        petrodb.update_entity(api, "area", 20, {"label": "A1b"})
        petrodb.delete_entity(api, "profilespot", 70)
        m, url, kw = [c for c in t.calls if c[0] == "PUT"][0]
        assert url.endswith("/api/areas/20")
        assert kw["json"] == {"label": "A1b"}
        m, url, kw = [c for c in t.calls if c[0] == "DELETE"][0]
        assert url.endswith("/api/profilespots/70")
        with pytest.raises(ValueError):
            petrodb.update_entity(api, "banana", 1, {})

    def test_crud_respects_read_only_guard(self):
        api = _api(transport=_hier_transport())  # read_only=True default
        with pytest.raises(petrodb.ReadOnlyError):
            petrodb.delete_entity(api, "spot", 1)
        with pytest.raises(petrodb.ReadOnlyError):
            petrodb.update_entity(api, "spot", 1, {})
        with pytest.raises(petrodb.ReadOnlyError):
            petrodb.create_profile(api, "10", "x")
