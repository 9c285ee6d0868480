"""Warehouse connection/config resolution — the Job-2 bootstrap seam.

The reference fetches its database credentials at runtime before building
the JDBC options (``etl-glue-load-to-postgres.py:22-45``: secret lookup →
username/password/host/port/dbname → jdbc url + connection properties).
This module is the engine's equivalent seam, resolved in order:

1. ``SG_WH_CONFIG`` — path to a JSON file ``{"url": ..., "properties":
   {...}}`` (the secrets-manager analogue: credentials live outside code).
2. ``SG_WH_URL`` (+ optional ``SG_WH_USER`` / ``SG_WH_PASSWORD`` /
   ``SG_WH_DRIVER``) environment variables.
3. Default: embedded Derby in-memory (``jdbc:derby:memory:...``) — Derby
   ships on Spark's classpath, so the real JDBC write path (zero-row
   existence probe, first-time create, append) executes everywhere with no
   external service.

Credentials never appear in code or logs; ``describe()`` redacts them.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def resolve_warehouse_config(db_name: str | None = None) -> tuple[str, dict]:
    """Resolve (jdbc_url, connection_properties) from config file, env,
    or the embedded-Derby default."""
    cfg_path = os.environ.get("SG_WH_CONFIG")
    if cfg_path:
        with open(cfg_path) as f:
            cfg = json.load(f)
        return cfg["url"], dict(cfg.get("properties", {}))

    url = os.environ.get("SG_WH_URL")
    if url:
        props = {}
        if os.environ.get("SG_WH_USER"):
            props["user"] = os.environ["SG_WH_USER"]
        if os.environ.get("SG_WH_PASSWORD"):
            props["password"] = os.environ["SG_WH_PASSWORD"]
        if os.environ.get("SG_WH_DRIVER"):
            props["driver"] = os.environ["SG_WH_DRIVER"]
        return url, props

    name = db_name or f"wh_{uuid.uuid4().hex[:12]}"
    return f"jdbc:derby:memory:{name};create=true", {"driver": DERBY_DRIVER}


def describe(url: str, properties: dict) -> str:
    """Loggable one-liner with credentials redacted."""
    safe = {k: ("***" if k.lower() in ("password", "user") else v)
            for k, v in properties.items()}
    return f"warehouse url={url.split(';')[0]} properties={safe}"


def drop_derby_memory_db(spark: SparkSession, url: str) -> None:
    """Release an in-memory Derby database (they live until JVM exit
    otherwise).  No-op for non-Derby URLs."""
    if not url.startswith("jdbc:derby:memory:"):
        return
    base = url.split(";")[0]
    try:
        spark._jvm.java.sql.DriverManager.getConnection(base + ";drop=true")
    except Exception:
        # Derby signals a successful drop WITH an exception (08006) — and
        # an unknown-db drop is equally fine here
        pass
