package fkta;

import java.io.IOException;
import java.math.BigDecimal;
import java.math.BigInteger;
import java.nio.ByteBuffer;
import java.time.Instant;
import java.time.LocalDate;
import java.util.ArrayList;
import java.util.HashMap;
import java.util.Iterator;
import java.util.List;
import java.util.Map;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.avro.LogicalType;
import org.apache.avro.LogicalTypes;
import org.apache.avro.Schema;
import org.apache.avro.generic.GenericDatumReader;
import org.apache.avro.generic.GenericFixed;
import org.apache.avro.generic.GenericRecord;
import org.apache.avro.io.BinaryDecoder;
import org.apache.avro.io.DecoderFactory;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.RowFactory;
import org.apache.spark.sql.api.java.UDF4;

/**
 * JVM-side decoder for (optionally Confluent-framed) Avro payloads,
 * compiled in-repo with javac against the avro-1.12 jar that ships inside
 * pyspark — no external spark-avro artifact needed (the sandbox has no
 * network; see tests/test_java_udf_avro.py for the build-and-run proof).
 *
 * Reference surface: the 'avro-confluent' Flink format
 * (TransactionProcessor.java:112-115) — magic 0x00 + int32 big-endian
 * schema id + Avro binary body. Schema evolution uses Avro's OWN
 * resolution (GenericDatumReader(writer, reader)), the same rules the
 * pure-Python codec implements in sources/avro_codec.py; parity between
 * the three decode paths (spark-avro from_avro, this UDF, Python
 * mapInPandas) is asserted by tests.
 *
 * Arguments: (payload bytes, reader schema JSON, writer-schemas-by-id
 * JSON object or null, header length 0|5). Value conversion mirrors
 * avro_schema.avro_to_struct: enum→String, fixed/bytes→byte[],
 * timestamp-millis/micros→Instant, date→LocalDate, decimal→BigDecimal,
 * uuid→String, unions of [null, T] only.
 *
 * A row-at-a-time UDF cannot pre-scan a batch for mixed schema ids the
 * way the Python fallback does, so the Python caller (sources/kafka.py)
 * only routes here when the caller DECLARED what to expect — a
 * writer-schema map (unknown ids throw below), an expected-id allowlist
 * (enforced by a codegen guard upstream), or unframed payloads.
 * Undeclared framed topics stay on the Python path, whose batch-level
 * id pre-scan fails loudly on mixed versions before any mis-decode.
 */
public class ConfluentAvroDecode implements UDF4<byte[], String, String, Integer, Row> {

  // all caches are per-executor-JVM, keyed by schema JSON (schemas are
  // immutable and thread-safe; GenericDatumReader.read is thread-safe —
  // it resolves via a per-thread cache internally)
  private static final Map<String, Schema> SCHEMAS = new ConcurrentHashMap<>();
  private static final Map<String, Map<Integer, Schema>> WRITER_MAPS =
      new ConcurrentHashMap<>();
  private static final Map<String, GenericDatumReader<GenericRecord>> READERS =
      new ConcurrentHashMap<>();

  private static Schema parse(String json) {
    return SCHEMAS.computeIfAbsent(json, j -> new Schema.Parser().parse(j));
  }

  /** Parse {"<id>": "<schema json>", ...}; values may be objects or strings. */
  private static Map<Integer, Schema> parseWriterMap(String json) {
    return WRITER_MAPS.computeIfAbsent(json, j -> {
      Map<Integer, Schema> out = new HashMap<>();
      // minimal JSON-object walk without a JSON library on the classpath:
      // use Avro's Jackson (bundled inside avro-1.12) via Schema.Parser on
      // each value; the outer map is parsed with Jackson directly.
      try {
        com.fasterxml.jackson.databind.ObjectMapper m =
            new com.fasterxml.jackson.databind.ObjectMapper();
        com.fasterxml.jackson.databind.JsonNode node = m.readTree(j);
        Iterator<Map.Entry<String, com.fasterxml.jackson.databind.JsonNode>> it =
            node.fields();
        while (it.hasNext()) {
          Map.Entry<String, com.fasterxml.jackson.databind.JsonNode> e = it.next();
          String schemaJson = e.getValue().isTextual()
              ? e.getValue().asText() : e.getValue().toString();
          out.put(Integer.valueOf(e.getKey()), parse(schemaJson));
        }
      } catch (IOException ex) {
        throw new IllegalArgumentException(
            "writer_schemas must be a JSON object of id -> schema", ex);
      }
      return out;
    });
  }

  private static GenericDatumReader<GenericRecord> readerFor(
      Schema writer, Schema reader) {
    String key = System.identityHashCode(writer) + "|"
        + System.identityHashCode(reader);
    return READERS.computeIfAbsent(
        key, k -> new GenericDatumReader<>(writer, reader));
  }

  @Override
  public Row call(byte[] payload, String readerJson, String writerMapJson,
                  Integer headerLen) throws Exception {
    if (payload == null) {
      return null;
    }
    int header = headerLen == null ? 0 : headerLen.intValue();
    Schema reader = parse(readerJson);
    Schema writer = reader;
    if (header > 0) {
      if (payload.length < header || payload[0] != 0x00) {
        throw new IllegalArgumentException(
            "payload is not Confluent-framed (magic byte != 0x00)");
      }
      int schemaId = ((payload[1] & 0xff) << 24) | ((payload[2] & 0xff) << 16)
          | ((payload[3] & 0xff) << 8) | (payload[4] & 0xff);
      if (writerMapJson != null && !writerMapJson.isEmpty()) {
        Map<Integer, Schema> writers = parseWriterMap(writerMapJson);
        writer = writers.get(schemaId);
        if (writer == null) {
          throw new IllegalArgumentException(
              "unknown Avro schema id " + schemaId + "; known ids: "
              + writers.keySet());
        }
      }
    }
    BinaryDecoder dec = DecoderFactory.get().binaryDecoder(
        payload, header, payload.length - header, null);
    GenericRecord rec = readerFor(writer, reader).read(null, dec);
    return (Row) convert(rec, reader);
  }

  /** Avro generic value -> Catalyst-external value (see class doc). */
  private static Object convert(Object v, Schema schema) {
    if (v == null) {
      return null;
    }
    switch (schema.getType()) {
      case UNION: {
        // only [null, T] unions (avro_to_struct enforces the same)
        for (Schema branch : schema.getTypes()) {
          if (branch.getType() != Schema.Type.NULL) {
            return convert(v, branch);
          }
        }
        return null;
      }
      case RECORD: {
        GenericRecord rec = (GenericRecord) v;
        List<Schema.Field> fields = schema.getFields();
        Object[] vals = new Object[fields.size()];
        for (int i = 0; i < fields.size(); i++) {
          vals[i] = convert(rec.get(i), fields.get(i).schema());
        }
        return RowFactory.create(vals);
      }
      case ARRAY: {
        List<?> in = (List<?>) v;
        List<Object> out = new ArrayList<>(in.size());
        for (Object item : in) {
          out.add(convert(item, schema.getElementType()));
        }
        return out;
      }
      case MAP: {
        Map<?, ?> in = (Map<?, ?>) v;
        Map<String, Object> out = new HashMap<>(in.size() * 2);
        for (Map.Entry<?, ?> e : in.entrySet()) {
          out.put(e.getKey().toString(),
                  convert(e.getValue(), schema.getValueType()));
        }
        return out;
      }
      case ENUM:
      case STRING:
        return v.toString();
      case FIXED: {
        byte[] bytes = ((GenericFixed) v).bytes();
        return decimalOrBytes(bytes, schema);
      }
      case BYTES: {
        ByteBuffer buf = (ByteBuffer) v;
        byte[] bytes = new byte[buf.remaining()];
        buf.duplicate().get(bytes);
        return decimalOrBytes(bytes, schema);
      }
      case INT: {
        LogicalType lt = schema.getLogicalType();
        if (lt instanceof LogicalTypes.Date) {
          return LocalDate.ofEpochDay(((Number) v).intValue());
        }
        return ((Number) v).intValue();
      }
      case LONG: {
        LogicalType lt = schema.getLogicalType();
        long raw = ((Number) v).longValue();
        if (lt instanceof LogicalTypes.TimestampMillis
            || lt instanceof LogicalTypes.LocalTimestampMillis) {
          return Instant.ofEpochMilli(raw);
        }
        if (lt instanceof LogicalTypes.TimestampMicros
            || lt instanceof LogicalTypes.LocalTimestampMicros) {
          return Instant.ofEpochSecond(
              Math.floorDiv(raw, 1_000_000L),
              Math.floorMod(raw, 1_000_000L) * 1_000L);
        }
        return raw;
      }
      case FLOAT:
        return ((Number) v).floatValue();
      case DOUBLE:
        return ((Number) v).doubleValue();
      case BOOLEAN:
        return v;
      default:
        throw new IllegalArgumentException(
            "unsupported avro type: " + schema.getType());
    }
  }

  private static Object decimalOrBytes(byte[] bytes, Schema schema) {
    LogicalType lt = schema.getLogicalType();
    if (lt instanceof LogicalTypes.Decimal) {
      return new BigDecimal(new BigInteger(bytes),
                            ((LogicalTypes.Decimal) lt).getScale());
    }
    return bytes;
  }
}
