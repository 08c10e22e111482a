#!/bin/bash
# Usage: scripts/oracle_check.sh q_name1 q_name2 ...
# Runs the named SparkEntry queries via spark-shell on sf0.01, dumps
# parquet + per-query oracle .sql files, compares in DuckDB like the driver.
set -e
cd /root/repo
QUERIES="$@"
rm -rf /tmp/oc && mkdir -p /tmp/oc
cat > /tmp/oc_drive.scala <<EOF
val names = "$QUERIES".split(" ").filter(_.nonEmpty)
val sf = "/root/testdata/sf0.01"
names.foreach { n =>
  println(s"[oc] running \$n")
  graft.SparkEntry.queries(n)(spark, sf).repartition(1)
    .write.mode("overwrite").parquet(s"/tmp/oc/\$n")
}
graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1)).foreach {
  case (k, v) =>
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"/tmp/oc/\$k.sql"), v)
}
System.exit(0)
EOF
/opt/spark/bin/spark-shell --master 'local[8]' \
  --jars target/scala-2.13/geospatiallearnspark_2.13-0.1.0.jar \
  --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=8 \
  --conf spark.driver.memory=8g \
  -I /tmp/oc_drive.scala 2>/dev/null | grep -E "\[oc\]|Exception|error:" || true
python3 - <<'EOF'
import duckdb, glob, os, sys
con = duckdb.connect()
sf = '/root/testdata/sf0.01'
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
fail = 0
for f in sorted(glob.glob('/tmp/oc/*.sql')):
    name = os.path.basename(f)[:-4]
    sql = open(f).read()
    try:
        got = con.sql(f"SELECT * FROM '/tmp/oc/{name}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as ex:
        print(name, 'ERROR:', str(ex)[:300]); fail += 1; continue
    cols = sorted(got.columns)
    if sorted(exp.columns) != cols:
        print(name, 'COLS MISMATCH got', cols, 'exp', sorted(exp.columns)); fail += 1; continue
    g = got[cols].sort_values(cols).reset_index(drop=True).round(4)
    e = exp[cols].sort_values(cols).reset_index(drop=True).round(4)
    if g.shape != e.shape:
        print(name, f'SHAPE MISMATCH {g.shape} vs {e.shape}'); fail += 1; continue
    if not g.equals(e):
        print(name, 'VALUE MISMATCH; dtypes got:', dict(g.dtypes.astype(str)), 'exp:', dict(e.dtypes.astype(str)))
        neq = (g != e) & ~(g.isna() & e.isna())
        rows = neq.any(axis=1)
        print(g[rows].head(3)); print(e[rows].head(3)); fail += 1; continue
    print(name, 'OK', g.shape)
sys.exit(1 if fail else 0)
EOF
