"""HTTP admin plane (AliveHandler/MonitorHandler + SetBinlogPosHandler
analogs) — contract test against a live stdlib server."""

import json
import urllib.request

from binlake_spark.admin import AdminServer
from binlake_spark.streaming.alarms import AlarmManager


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_admin_http_contract(spark, tmp_path):
    from binlake_spark.changelog.generator import (
        CHANGE_LOG_SCHEMA,
        GenSpec,
        generate_change_log,
        write_change_log,
    )
    from binlake_spark.streaming import CdcEngine

    pdf = generate_change_log(GenSpec(n_docs=30, n_events=300))
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    log = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(src)

    am = AlarmManager(epoch_wall_warn_ms=0)
    engine = CdcEngine(
        CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4),
        alarms=am,
    )
    engine.apply_batch(log, epoch_id=0)

    with AdminServer(engine.table, alarms=am) as srv:
        port = srv.port
        assert _get(port, "/alive") == (200, {"status": "SUCCESS"})

        code, mon = _get(port, "/monitor")
        assert code == 200 and mon["num_buckets"] == 4
        assert mon["epochs"] == {"cdc": 0} and mon["alarms"] == 1
        assert mon["watermark_max"] >= mon["watermark_min"] > 0

        code, offs = _get(port, "/offsets")
        assert code == 200 and len(offs["watermarks"]) == 4

        code, lin = _get(port, "/lineage?n=5")
        assert code == 200 and lin[-1]["kind"] == "merge"

        code, alarms = _get(port, "/alarms")
        assert code == 200 and alarms[0]["rule"] == "epoch-slow"

        # SetBinlogPosHandler analog: rewind the epoch guard over HTTP,
        # audited in lineage, then re-apply actually runs again
        code, res = _post(port, "/set-position",
                          {"stream_id": "cdc", "epoch": -1})
        assert code == 200 and res["previous_epoch"] == 0
        assert engine.table.last_epoch("cdc") == -1
        _, lin = _get(port, "/lineage?n=1")
        assert lin[0]["kind"] == "admin" and lin[0]["op"] == "set_stream_epoch"
        assert engine.apply_batch(log, epoch_id=0).applied

        code, res = _post(port, "/reset-watermarks", {"buckets": [0, 1]})
        assert code == 200 and sorted(map(int, res["cleared"])) == [0, 1]

        # error contract: bad body is a 400, unknown route a 404
        assert _post(port, "/set-position", {"epoch": 3})[0] == 400
        assert _get(port, "/nope")[0] == 404
        assert _post(port, "/nope", {})[0] == 404


def test_lineage_n_zero_and_bad_n(spark, tmp_path):
    """n=0 returns zero entries (not the whole log via [-0:]); a
    non-integer n is a 400, not a 500."""
    from binlake_spark.streaming import CdcEngine

    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=2)
    with AdminServer(table) as srv:
        port = srv.port
        code, lin = _get(port, "/lineage?n=0")
        assert code == 200 and lin == []
        code, err = _get(port, "/lineage?n=abc")
        assert code == 400


def test_admin_rollback_endpoint(spark, tmp_path):
    """POST /rollback reverts the table to a tag's state atomically and
    reports the new version; digit strings mean versions (not tag
    names), and unknown versions/tags are the caller's error — 404, not
    a 500 server fault."""
    from binlake_spark.changelog import GenSpec, generate_change_log, write_change_log
    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
    from binlake_spark.streaming import CdcEngine
    from pyspark.sql import functions as F

    pdf = generate_change_log(GenSpec(n_docs=30, n_events=600, events_per_epoch=300))
    write_change_log(pdf, str(tmp_path / "log"))
    log = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(str(tmp_path / "log"))
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    engine.apply_batch(log.filter(F.col("epoch_hint") == 0), epoch_id=0)
    table.tag("good")
    good = {r.doc_id: r.n_tok for r in table.read(spark).collect()}
    engine.apply_batch(log.filter(F.col("epoch_hint") == 1), epoch_id=1)

    with AdminServer(table) as srv:
        code, body = _post(srv.port, "/rollback", {"version": "good"})
        assert code == 200 and body["status"] == "SUCCESS"
        assert body["version"] == int(table.snapshot()["version"])
        assert {r.doc_id: r.n_tok for r in table.read(spark).collect()} == good

        code, body = _post(srv.port, "/rollback", {"version": "no-such-tag"})
        assert code == 404 and "error" in body

        # '3' is version 3, not a tag lookup: a stringified version from
        # a JSON client must behave exactly like the integer form
        v_good = table.tags()["good"]
        code, body = _post(srv.port, "/rollback", {"version": str(v_good)})
        assert code == 200 and body["status"] == "SUCCESS"

        code, body = _post(srv.port, "/rollback", {"version": "999999"})
        assert code == 404 and "error" in body

        code, body = _post(srv.port, "/rollback", {})
        assert code == 400

        # a tag whose NAME is all digits is swallowed by the
        # digit-string-as-version coercion on the "version" key — the
        # explicit {"tag": ...} key keeps it addressable (ADVICE r4)
        table.tag("20260818")
        code, body = _post(srv.port, "/rollback", {"version": "20260818"})
        assert code == 404  # coerced to (unknown) version 20260818
        code, body = _post(srv.port, "/rollback", {"tag": "20260818"})
        assert code == 200 and body["status"] == "SUCCESS"
        assert body["version"] == int(table.snapshot()["version"])


def test_admin_fleet_registry(spark, tmp_path):
    """Fleet mode (tower ApiCenter analog): one admin process serves N
    tables — /tables lists per-table health, /t/<name>/... namespaces
    every per-table route, unknown names 404."""
    from binlake_spark.changelog import GenSpec, generate_change_log, write_change_log
    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
    from binlake_spark.streaming import CdcEngine
    from pyspark.sql import functions as F

    tables = {}
    for name, n in (("orders", 200), ("docs", 300)):
        pdf = generate_change_log(GenSpec(n_docs=10, n_events=n))
        write_change_log(pdf, str(tmp_path / f"log_{name}"))
        log = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(str(tmp_path / f"log_{name}"))
        t = CdcEngine.create_table(str(tmp_path / name), num_buckets=4)
        CdcEngine(t).apply_batch(log, epoch_id=0)
        tables[name] = t

    with AdminServer(tables=tables) as srv:
        code, listing = _get(srv.port, "/tables")
        assert code == 200 and set(listing) == {"orders", "docs"}
        assert all(m["buckets_with_data"] > 0 for m in listing.values())

        code, snap = _get(srv.port, "/t/docs/snapshot")
        assert code == 200 and int(snap["version"]) >= 1

        code, mon = _get(srv.port, "/t/orders/monitor")
        assert code == 200 and mon["version"] == listing["orders"]["version"]

        code, _ = _get(srv.port, "/t/nope/snapshot")
        assert code == 404

        # POST routes namespace too: set-position on one table does not
        # touch the other
        code, body = _post(
            srv.port, "/t/docs/set-position", {"stream_id": "s1", "epoch": 7}
        )
        assert code == 200 and body["epoch"] == 7
        assert tables["docs"].snapshot()["epochs"].get("s1") == 7
        assert "s1" not in tables["orders"].snapshot()["epochs"]

        # the flat API still serves the default (first) table
        code, alive = _get(srv.port, "/alive")
        assert code == 200
