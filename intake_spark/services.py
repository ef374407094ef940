"""Service readers: network-backed sources mapped to Spark connectors or
driver-side REST fetch + ``createDataFrame``.

Parity with the reference's service readers (intake/readers/readers.py:
3192-3473 — Kafka/MQTT/Flight/Influx/Mongo/Elasticsearch/Redis/Socrata/
OGC/Prometheus/Tiled). All are import- or network-gated: constructing the
reader (description) always works and is catalogable; ``.read()`` raises a
clear error when the connector jar / python client / endpoint is missing.

Design rule: sources with a Spark DataSource connector (Mongo, ES, Kafka)
use it — reads stay distributed and predicate-pushable. REST/paging APIs
(Socrata, OGC, Prometheus) fetch on the driver and distribute via
``createDataFrame`` — correct for catalog/metadata-sized payloads; at bulk
scale those services export to object storage first.
"""

from __future__ import annotations

from intake_spark import datatypes as dt
from intake_spark.readers import BaseReader


class MongoDBService(dt.Service):
    structure = {"nested"}

    def __init__(self, url, database: str, collection: str, options=None, metadata=None):
        super().__init__(url, options, metadata)
        self.database = database
        self.collection = collection


class ElasticsearchService(dt.Service):
    structure = {"nested"}

    def __init__(self, url, index: str, query: str = "", options=None, metadata=None):
        super().__init__(url, options, metadata)
        self.index = index
        self.query = query


class RedisService(dt.Service):
    structure = {"nested"}

    def __init__(self, url, pattern: str = "*", options=None, metadata=None):
        super().__init__(url, options, metadata)
        self.pattern = pattern


class Prometheus(dt.Service):
    structure = {"timeseries"}

    def __init__(self, url, query: str, options=None, metadata=None):
        super().__init__(url, options, metadata)
        self.query = query


class SocrataService(dt.Service):
    structure = {"table"}

    def __init__(self, url, dataset_id: str, options=None, metadata=None):
        super().__init__(url, options, metadata)
        self.dataset_id = dataset_id


class OGCAPIFeatures(dt.Service):
    structure = {"table", "nested"}

    def __init__(self, url, collection: str, options=None, metadata=None):
        super().__init__(url, options, metadata)
        self.collection = collection


class ArrowFlightService(dt.Service):
    structure = {"table"}

    def __init__(self, url, path: str = "", options=None, metadata=None):
        super().__init__(url, options, metadata)
        self.path = path


class MQTTTopic(dt.Service):
    structure = {"sequence"}

    def __init__(self, url, topic: str, options=None, metadata=None):
        super().__init__(url, options, metadata)
        self.topic = topic


class MongoDBReader(BaseReader):
    """Distributed read through the mongo-spark connector (partition split
    by the connector; predicates push into aggregation pipelines)."""

    implements = {MongoDBService}

    def _read(self, spark, **kwargs):
        return (
            spark.read.format("mongodb")
            .option("connection.uri", self.data.url)
            .option("database", self.data.database)
            .option("collection", self.data.collection)
            .options(**{**self.data.options, **kwargs})
            .load()
        )


class ElasticsearchReader(BaseReader):
    """elasticsearch-hadoop connector: one Spark partition per ES shard."""

    implements = {ElasticsearchService}

    def _read(self, spark, **kwargs):
        reader = (
            spark.read.format("es")
            .option("es.nodes", self.data.url)
            .option("es.resource", self.data.index)
        )
        if self.data.query:
            reader = reader.option("es.query", self.data.query)
        return reader.options(**{**self.data.options, **kwargs}).load()


class RedisReader(BaseReader):
    """Driver-side key scan → createDataFrame (Redis holds small/hot data;
    parity: readers.py:3397-3418)."""

    implements = {RedisService}
    imports = {"redis"}

    def _read(self, spark, limit: int = 10000, **kwargs):
        import redis as redis_mod

        client = redis_mod.Redis.from_url(self.data.url)
        rows = []
        for key in client.scan_iter(match=self.data.pattern, count=1000):
            rows.append({"key": key.decode(), "value": client.get(key).decode()})
            if len(rows) >= limit:
                break
        return spark.createDataFrame(rows or [{"key": "", "value": ""}])


class PrometheusMetricReader(BaseReader):
    """REST range query → timeseries rows (parity: readers.py:1720-1745)."""

    implements = {Prometheus}

    def _read(self, spark, start=None, end=None, step="1m", **kwargs):
        import json
        import urllib.request

        url = f"{self.data.url}/api/v1/query_range?query={self.data.query}&start={start}&end={end}&step={step}"
        with urllib.request.urlopen(url, timeout=30) as resp:
            payload = json.load(resp)
        rows = [
            {"metric": json.dumps(series["metric"]), "ts": float(t), "value": float(v)}
            for series in payload["data"]["result"]
            for t, v in series["values"]
        ]
        return spark.createDataFrame(rows)


class SocrataReader(BaseReader):
    """Paged REST fetch → createDataFrame (parity: readers.py:3419-3445)."""

    implements = {SocrataService}

    def _read(self, spark, page_size: int = 10000, max_rows: int = 100000, **kwargs):
        import json
        import urllib.request

        rows, offset = [], 0
        while offset < max_rows:
            url = f"{self.data.url}/resource/{self.data.dataset_id}.json?$limit={page_size}&$offset={offset}"
            with urllib.request.urlopen(url, timeout=30) as resp:
                page = json.load(resp)
            rows.extend(page)
            if len(page) < page_size:
                break
            offset += page_size
        return spark.createDataFrame(rows)


class OGCAPIFeaturesReader(BaseReader):
    """OGC API Features paging → rows with WKB/GeoJSON geometry column
    (parity: readers.py:3446-3473)."""

    implements = {OGCAPIFeatures}

    def _read(self, spark, max_pages: int = 100, **kwargs):
        import json
        import urllib.request

        rows = []
        url = f"{self.data.url}/collections/{self.data.collection}/items?f=json"
        for _ in range(max_pages):
            with urllib.request.urlopen(url, timeout=30) as resp:
                page = json.load(resp)
            for feat in page.get("features", []):
                rows.append(
                    {
                        "id": str(feat.get("id")),
                        "geometry": json.dumps(feat.get("geometry")),
                        "properties": json.dumps(feat.get("properties")),
                    }
                )
            nxt = [l for l in page.get("links", []) if l.get("rel") == "next"]
            if not nxt:
                break
            url = nxt[0]["href"]
        return spark.createDataFrame(rows)


class ArrowFlightReader(BaseReader):
    """Flight stream → Arrow → createDataFrame (parity: readers.py:3288-3314)."""

    implements = {ArrowFlightService}
    imports = {"pyarrow.flight"}

    def _read(self, spark, **kwargs):
        import pyarrow.flight as fl

        client = fl.connect(self.data.url)
        ticket = fl.Ticket(self.data.path.encode())
        table = client.do_get(ticket).read_all()
        return spark.createDataFrame(table.to_pandas())


class MQTTReader(BaseReader):
    """Collect-N-messages batch peek (parity: readers.py:3238-3285)."""

    implements = {MQTTTopic}
    imports = {"paho.mqtt"}

    def _read(self, spark, n_messages: int = 100, timeout_s: float = 30.0, **kwargs):
        import paho.mqtt.client as mqtt  # type: ignore

        rows: list[dict] = []

        def on_message(client, userdata, msg):
            rows.append({"topic": msg.topic, "payload": msg.payload.decode(errors="replace")})
            if len(rows) >= n_messages:
                client.disconnect()

        client = mqtt.Client()
        client.on_message = on_message
        host, _, port = self.data.url.partition(":")
        client.connect(host, int(port or 1883))
        client.subscribe(self.data.topic)
        client.loop_start()
        import time

        t0 = time.time()
        while len(rows) < n_messages and time.time() - t0 < timeout_s:
            time.sleep(0.05)
        client.loop_stop()
        return spark.createDataFrame(rows or [{"topic": "", "payload": ""}])
