#!/usr/bin/env bash
# Cluster-packaging smoke: the first thing a real user does with this
# engine — package the library and spark-submit a job — exercised
# end-to-end. The repo compiles against the unmanaged /opt/spark/jars
# and has no runtime deps beyond Spark itself, so the THIN jar from
# `sbt package` is the deployable artifact (no assembly/shading needed;
# scalatest is test-scope only).
#
# Usage: bash tools/submit_smoke.sh
# Exit 0 = packaged jar ran under spark-submit and produced the
# reference converter's contract output (10-way repartitioned parquet).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[smoke] packaging thin jar"
sbt -batch package > /tmp/submit_smoke_sbt.log 2>&1 || {
  tail -20 /tmp/submit_smoke_sbt.log; exit 1; }
JAR=$(ls target/scala-2.13/*.jar | grep -v -- -tests | head -1)
[ -n "$JAR" ] || { echo "[smoke] no jar produced"; exit 1; }
echo "[smoke] jar: $JAR"

IN=$(mktemp -d /tmp/smoke_tsv.XXXX)
OUT=/tmp/smoke_out_parquet
rm -rf "$OUT"
# 40 rows: repartition(10) round-robins rows, and Spark writes a part
# file only for NON-EMPTY partitions — enough rows guarantees all 10
printf 'product_id\tproduct_category\tprice\n' > "$IN/data.tsv"
for i in $(seq 1 40); do
  case $((i % 4)) in
    0) c=books;; 1) c=toys;; 2) c=games;; 3) c=music;;
  esac
  printf '%s\t%s\t%s.25\n' "$i" "$c" "$i" >> "$IN/data.tsv"
done

echo "[smoke] spark-submit graft.ConverterMain"
/opt/spark/bin/spark-submit \
  --master "local[4]" \
  --class graft.ConverterMain \
  "$JAR" "$IN" "$OUT" > /tmp/submit_smoke_run.log 2>&1 || {
  tail -30 /tmp/submit_smoke_run.log; exit 1; }

# contract checks: _SUCCESS marker, 10 part files (repartition(10)),
# 40 rows round-tripped with the all-string schema
[ -f "$OUT/_SUCCESS" ] || { echo "[smoke] missing _SUCCESS"; exit 1; }
PARTS=$(ls "$OUT"/part-*.parquet | wc -l)
[ "$PARTS" -eq 10 ] || { echo "[smoke] expected 10 part files, got $PARTS"; exit 1; }
python3 - "$OUT" <<'EOF'
import sys, glob
from collections import Counter
import pyarrow.parquet as pq
tables = [pq.read_table(f) for f in sorted(glob.glob(sys.argv[1] + "/part-*.parquet"))]
rows = sum(t.num_rows for t in tables)
assert rows == 40, f"expected 40 rows, got {rows}"
schema = tables[0].schema
assert all(str(schema.field(n).type) == "string" for n in schema.names), schema
cats = Counter(c for t in tables for c in t.column("product_category").to_pylist())
assert cats == Counter(books=10, toys=10, games=10, music=10), cats
print("[smoke] parquet contract OK: 40 rows, all-string schema, categories match")
EOF
# Second leg: the LIBRARY itself (not just the trivial converter)
# through spark-submit — graft.Verify runs registry queries that
# exercise the custom Catalyst expressions (q31's codegen'd
# dot_product, q22's BcDiv via GraftExtensions), proving the packaged
# jar carries the whole engine, not only the demo class.
VOUT=/tmp/smoke_verify_out
rm -rf "$VOUT"
echo "[smoke] spark-submit graft.Verify (library leg)"
SPARK_GRAFT_CPUS=4 /opt/spark/bin/spark-submit \
  --master "local[4]" \
  --class graft.Verify \
  "$JAR" /root/testdata/sf0.001 "$VOUT" \
  q01_scan_agg q22_math_funcs q31_cosine_topk \
  > /tmp/submit_smoke_verify.log 2>&1 || {
  tail -30 /tmp/submit_smoke_verify.log; exit 1; }
for q in q01_scan_agg q22_math_funcs q31_cosine_topk; do
  [ -f "$VOUT/$q/_SUCCESS" ] || { echo "[smoke] $q missing output"; exit 1; }
  [ ! -f "$VOUT/$q/_ERROR" ]  || { echo "[smoke] $q errored:"; cat "$VOUT/$q/_ERROR"; exit 1; }
done
python3 - "$VOUT" <<'EOF'
import sys, glob
import pyarrow.parquet as pq
for q in ("q01_scan_agg", "q22_math_funcs", "q31_cosine_topk"):
    rows = sum(pq.read_table(f).num_rows
               for f in glob.glob(f"{sys.argv[1]}/{q}/part-*.parquet"))
    assert rows > 0, f"{q}: empty result through spark-submit"
    print(f"[smoke] {q}: {rows} rows via packaged jar")
EOF
echo "[smoke] PASS: thin jar + spark-submit end-to-end (converter + library)"
