"""Build + register the in-repo JVM Avro codec UDFs (java/fkta/*.java).

Why this exists: the documented 100 TB decode path is spark-avro's
``from_avro`` codegen expression, but that artifact is external and this
sandbox has no network to fetch it (see tests/test_infra_gated.py's
round-5 vendoring note). What the sandbox DOES have is ``javac`` (Java 17)
and the core ``avro-1.12`` jar that ships inside pyspark itself — enough
to compile a real JVM-side decoder/encoder from the ~200 lines of Java in
``java/fkta/``. That gives three decode paths, fastest available wins:

1. spark-avro ``from_avro``  — whole-stage codegen, zero per-row calls
   (needs the external jar; env-gated parity test).
2. ``fkta.ConfluentAvroDecode`` Java UDF  — per-row call but entirely
   JVM-side: no Arrow transfer, no Python interpreter, and Avro's OWN
   ``GenericDatumReader(writer, reader)`` schema resolution. Compiled
   here, on demand, from committed source.
3. Pure-Python codec via Arrow mapInPandas  — dependency-free fallback,
   full registry support (sources/avro_codec.py).

Parity among all reachable paths is asserted by tests/test_java_udf_avro.py
(decode equality and bit-identical encodes vs the Python codec).

Build model: compile iff the jar is missing or older than any .java
source, into ``build/`` (gitignored — the jar is an artifact, the source
is the deliverable). Registration is per-SparkSession: ``ADD JAR`` once,
then one ``registerJavaFunction`` per reader schema (a Java UDF has ONE
return type, and the returned struct depends on the schema).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import subprocess
import tempfile
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql.types import BinaryType

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_JAVA_SRC_DIR = os.path.join(_REPO_ROOT, "java")
_JAR_PATH = os.path.join(_REPO_ROOT, "build", "fkta-avro-udf.jar")

DECODE_CLASS = "fkta.ConfluentAvroDecode"
ENCODE_CLASS = "fkta.ConfluentAvroEncode"
ENCODE_FN = "fkta_avro_encode"

# process-local registration caches, keyed by Spark applicationId so a
# fresh session after a restart re-registers cleanly
_JARS_ADDED: set[str] = set()
_REGISTERED: set[tuple[str, str]] = set()
_BUILD_FAILED = False


def _java_sources() -> list[str]:
    if not os.path.isdir(_JAVA_SRC_DIR):
        return []
    out = []
    for root, _dirs, files in os.walk(_JAVA_SRC_DIR):
        out.extend(os.path.join(root, f) for f in files if f.endswith(".java"))
    return sorted(out)


def _pyspark_jars_dir() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "jars")


def ensure_built(force: bool = False) -> Optional[str]:
    """Compile java/fkta/*.java into build/fkta-avro-udf.jar if missing or
    stale. Returns the jar path, or None when it cannot be built (no javac,
    no sources, compile error) — callers then fall back to the Python
    codec. Failures are remembered so a broken toolchain costs one attempt
    per process, not one per query."""
    global _BUILD_FAILED
    sources = _java_sources()
    if not sources or _BUILD_FAILED:
        return None
    src_mtime = max(os.path.getmtime(s) for s in sources)
    if (
        not force
        and os.path.exists(_JAR_PATH)
        and os.path.getmtime(_JAR_PATH) >= src_mtime
    ):
        return _JAR_PATH
    javac = shutil.which("javac")
    jar_tool = shutil.which("jar")
    if javac is None or jar_tool is None:
        return None
    try:
        os.makedirs(os.path.dirname(_JAR_PATH), exist_ok=True)
        with tempfile.TemporaryDirectory(prefix="fkta-javac-") as tmp:
            classes = os.path.join(tmp, "classes")
            os.makedirs(classes)
            subprocess.run(
                [javac, "-encoding", "UTF-8",
                 "-cp", os.path.join(_pyspark_jars_dir(), "*"),
                 "-d", classes, *sources],
                check=True, capture_output=True, timeout=120,
            )
            tmp_jar = os.path.join(tmp, "out.jar")
            subprocess.run(
                [jar_tool, "cf", tmp_jar, "-C", classes, "."],
                check=True, capture_output=True, timeout=60,
            )
            # atomic publish so a concurrent reader never sees a torn jar
            os.replace(tmp_jar, _JAR_PATH)
        return _JAR_PATH
    except Exception:
        _BUILD_FAILED = True
        return None


def _add_jar(spark: SparkSession, jar: str) -> bool:
    app_id = spark.sparkContext.applicationId
    if app_id in _JARS_ADDED:
        return True
    try:
        spark.sql(f"ADD JAR 'file://{jar}'")
        _JARS_ADDED.add(app_id)
        return True
    except Exception:
        return False


def decode_fn_name(reader_schema_json: str) -> str:
    digest = hashlib.md5(reader_schema_json.encode()).hexdigest()[:10]
    return f"fkta_avro_decode_{digest}"


def ensure_decode_registered(
    spark: SparkSession, reader_schema_json: str
) -> Optional[str]:
    """Register the decode UDF for this reader schema (one registration per
    schema — the UDF's struct return type depends on it). Returns the SQL
    function name, or None when the JVM path is unavailable."""
    from flink_kafka_table_api_spark.avro_schema import avro_to_struct

    fname = decode_fn_name(reader_schema_json)
    app_id = spark.sparkContext.applicationId
    if (app_id, fname) in _REGISTERED:
        return fname
    jar = ensure_built()
    if jar is None or not _add_jar(spark, jar):
        return None
    try:
        spark.udf.registerJavaFunction(
            fname, DECODE_CLASS, avro_to_struct(reader_schema_json)
        )
    except Exception:
        return None
    _REGISTERED.add((app_id, fname))
    return fname


def ensure_encode_registered(spark: SparkSession) -> Optional[str]:
    """Register the encode UDF (single name — it always returns binary)."""
    app_id = spark.sparkContext.applicationId
    if (app_id, ENCODE_FN) in _REGISTERED:
        return ENCODE_FN
    jar = ensure_built()
    if jar is None or not _add_jar(spark, jar):
        return None
    try:
        spark.udf.registerJavaFunction(ENCODE_FN, ENCODE_CLASS, BinaryType())
    except Exception:
        return None
    _REGISTERED.add((app_id, ENCODE_FN))
    return ENCODE_FN


def writer_map_json(writer_schemas: dict[int, str] | None) -> Optional[str]:
    """Normalize {id: schema-json} to the JSON-object argument the decode
    UDF takes (string keys, schema values passed through as JSON text)."""
    if not writer_schemas:
        return None
    return json.dumps(
        {str(int(i)): s for i, s in sorted(writer_schemas.items())}
    )
