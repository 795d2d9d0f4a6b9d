#!/bin/bash
# End-to-end drive of all four verify surfaces (.claude/skills/verify):
# 1 library boundary from a foreign cwd, 2 driver contract entry(),
# 3 CLI pipeline run, 4 bench at sf0.01.  Exits non-zero on any failure.
set -e
cd /tmp
python - <<'EOF'
import sys; sys.path.insert(0, '/root/repo')
from polyminhash_spark.config import default_config
from polyminhash_spark.kernels import char_shingles
cfg = default_config()
assert len(cfg.config_hash()) >= 12
assert len(char_shingles('hello world foo', cfg.shingle_k)) > 0
print('surface 1 (library boundary): OK')
EOF
cd /root/repo
python - <<'EOF' 2>/dev/null
from pyspark.sql import SparkSession
import __spark_entry__ as e
s = (SparkSession.builder.master('local[8]')
     .config('spark.ui.enabled', 'false')
     .config('spark.sql.shuffle.partitions', '8').getOrCreate())
n = e.entry(s).count()
assert n >= 0
print(f'surface 2 (entry contract): OK rows={n}')
EOF
rm -rf /tmp/pmh_drive_out /tmp/pmh_drive_corpus.parquet
python -m polyminhash_spark.cli gen --out /tmp/pmh_drive_corpus.parquet \
    --n-files 300 >/dev/null 2>&1
python -m polyminhash_spark.cli run --input /tmp/pmh_drive_corpus.parquet \
    --out /tmp/pmh_drive_out >/dev/null 2>&1
test -f /tmp/pmh_drive_out/_SUCCESS
echo 'surface 3 (CLI pipeline): OK'
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 POLYMINHASH_BENCH_REPEATS=1 \
    python bench.py 2>/dev/null | tail -1 | python -c \
    "import json,sys; d=json.loads(sys.stdin.read()); \
     print('surface 4 (bench):', 'OK', d['value'], d['unit'])"
