"""WARC (ISO 28500 Web ARChive) build + parse stages.

Training-data pipelines start from WARC: Common Crawl ships ~100 TB per
crawl as concatenated WARC records, and the first distributed stage of
every corpus build is "parse WARC bytes → (url, payload) rows". The
reference has no ingest-format surface at all (its DSL hands records to a
deserializer, MockDeserializer.scala); this module adds the format stage
as engine operators:

- ``warc_record_col``: compose a spec-conformant WARC/1.0 ``response``
  record (headers + payload + record separator) as a BINARY column —
  pure ``concat``/``encode`` codegen, no UDF. Used to write WARC and to
  round-trip-test the parser against the corpus itself.
- ``pack_warc``: group rows into multi-record WARC FILES (one blob per
  group) — the on-disk shape real crawls have (thousands of records per
  .warc.gz member).
- ``parse_warc``: a REAL streaming WARC parser over binary blobs
  (``mapInPandas``, Arrow-batched): walks version lines, reads headers
  case-insensitively, honors ``Content-Length`` exactly (payloads are
  binary-safe — they may contain ``WARC/1.0`` bytes), enforces the
  CRLF-CRLF record separator, and yields one row per record with the
  target URI, record type, and payload bytes. Malformed tails produce a
  truncated-record row with ``warc_error`` set instead of poisoning the
  task (dead-letter posture, like sources/streaming.py's JSON split).

Scale shape: parsing is embarrassingly parallel per blob — a binary
column partition maps straight through Arrow batches; no shuffle until
the caller aggregates. Record COMPOSITION is whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CRLF = "\r\n"


def warc_record_col(uri: Column, payload: Column, record_id: Column) -> Column:
    """WARC/1.0 response record bytes from (uri, payload-string, id)
    columns — spec layout: version line, named headers, Content-Length of
    the payload BYTE length, blank line, payload, two CRLFs."""
    payload_bytes = F.encode(payload, "UTF-8")
    header = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Record-ID: <urn:uuid:"), record_id, F.lit(">" + _CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(_CRLF),
        F.lit("Content-Type: text/plain" + _CRLF),
        F.lit("Content-Length: "),
        F.length(payload_bytes).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    return F.concat(
        F.encode(header, "UTF-8"), payload_bytes, F.encode(F.lit(_CRLF + _CRLF), "UTF-8")
    )


def pack_warc(
    df: DataFrame, group_col: str, record_col: str = "warc", out_col: str = "warc_file"
) -> DataFrame:
    """Concatenate per-group record blobs into one WARC FILE blob per
    group (sorted by the records' composition order is the caller's
    responsibility — pass a frame with a deterministic order column and
    sort first). State per group is the concatenated byte blob — bound
    group sizes the same way real crawls bound .warc members (~1 GB).

    LINEAR concatenation via one Arrow-batched ``applyInPandas`` join
    per group (r11 — previously an ``aggregate(collect_list, concat)``
    fold, which re-copies the accumulated prefix per element: quadratic
    bytes per group)."""
    import pandas as pd

    gtype = df.schema[group_col].dataType.simpleString()
    schema = f"{group_col} {gtype}, {out_col} binary"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        blob = b"".join(sorted(bytes(m) for m in pdf[record_col]))
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]], out_col: [blob]}
        )

    return df.groupBy(group_col).applyInPandas(fn, schema)


def _parse_warc_blob(blob: bytes) -> list[tuple[str | None, str | None, bytes, str | None]]:
    """Parse one WARC blob → [(uri, rec_type, payload, error)]. Pure
    bytes walking; Content-Length-driven so payloads are binary-safe."""
    out: list[tuple[str | None, str | None, bytes, str | None]] = []
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not blob.startswith(b"WARC/", pos):
            out.append((None, None, b"", f"expected version line at {pos}"))
            break
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            out.append((None, None, b"", "unterminated header block"))
            break
        headers: dict[str, str] = {}
        lines = blob[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:  # [0] is the version line
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            out.append((headers.get("warc-target-uri"), headers.get("warc-type"),
                        b"", "missing/invalid Content-Length"))
            break
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            out.append((headers.get("warc-target-uri"), headers.get("warc-type"),
                        blob[body_start:n], "truncated payload"))
            break
        out.append(
            (headers.get("warc-target-uri"), headers.get("warc-type"),
             blob[body_start:body_end], None)
        )
        pos = body_end
    return out


def parse_warc(df: DataFrame, blob_col: str, keep_cols: list[str] | None = None) -> DataFrame:
    """Binary WARC blobs → one row per record: (keep_cols…, warc_uri,
    warc_type, payload: binary, warc_error). Arrow-batched mapInPandas;
    see module docstring for the parser contract."""
    import pandas as pd

    keep = keep_cols or []
    schema_keep = ", ".join(f"{df.schema[c].name} {df.schema[c].dataType.simpleString()}" for c in keep)
    schema = (schema_keep + ", " if schema_keep else "") + (
        "warc_uri string, warc_type string, payload binary, warc_error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                blob = row[blob_col]
                blob = bytes(blob) if blob is not None else b""
                for uri, rtype, payload, err in _parse_warc_blob(blob):
                    rows.append(
                        [row[c] for c in keep] + [uri, rtype, payload, err]
                    )
            yield pd.DataFrame(
                rows, columns=keep + ["warc_uri", "warc_type", "payload", "warc_error"]
            )

    return df.select(*keep, blob_col).mapInPandas(run, schema)
