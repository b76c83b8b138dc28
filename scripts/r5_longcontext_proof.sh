#!/bin/bash
# r5 full-context forward-only proof (VERDICT r4 #8): on-hardware VEP dump
# at the reference's actual 131k VEP setting (`vep_embeddings.py:362-377`)
# and a served /embed at the 131072 bucket, both on the v2 (SSD) family
# checkpoint from the r5 arm-A pretrain. Records wall times and (when the
# runtime exposes them) device memory stats into runs/r5_longcontext/.
#
# Usage: scripts/r5_longcontext_proof.sh [pretrain_run_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
PRETRAIN=${1:-runs/r5_arm_v2n128}
GEN=${R5_GENOME_DIR:-/tmp/r5_genome}
OUT=runs/r5_longcontext
mkdir -p "$OUT"

echo "== variants TSV over the structured genome"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - "$GEN" "$OUT" <<'EOF'
import sys
import numpy as np
from caduceus_tpu.data.fasta import FastaFile
gen, out = sys.argv[1], sys.argv[2]
fa = FastaFile(f"{gen}/genome.fa")
seq = fa.fetch("chr1", 0, 1 << 21)
rng = np.random.default_rng(0)
comp = {"A": "G", "C": "T", "G": "A", "T": "C", "N": "A"}
with open(f"{out}/variants.tsv", "w") as f:
    for i in range(16):
        pos = (1 << 17) + i * (1 << 16)
        ref = seq[pos]
        f.write(f"chr1\t{pos}\t{ref}\t{comp[ref]}\t{i % 2}\t{i * 3000}\n")
print("variants ready")
EOF

echo "== VEP dump at seq-len 131072 (16 variants, ref+alt windows)"
python -m caduceus_tpu.cli vep \
  --fasta "$GEN/genome.fa" --variants "$OUT/variants.tsv" \
  --run-dir "$PRETRAIN" --seq-len 131072 --batch-size 1 \
  --out "$OUT/vep_embeddings" --svm 2>&1 | tee "$OUT/vep.log" | tail -20

echo "== serve: /embed at the 131072 bucket (min-bucket pinned = one program)"
python -m caduceus_tpu.cli serve --run-dir "$PRETRAIN" \
  --port 8737 --max-length 131072 --min-bucket 131072 > "$OUT/serve.log" 2>&1 &
SERVE_PID=$!
trap 'kill $SERVE_PID 2>/dev/null || true' EXIT
for i in $(seq 1 600); do
  curl -s http://127.0.0.1:8737/healthz > /dev/null 2>&1 && break
  sleep 1
done
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python - "$OUT" <<'EOF'
import json, sys, time, urllib.request
out = sys.argv[1]
seq = ("ACGT" * (131072 // 4))
def embed():
    req = urllib.request.Request(
        "http://127.0.0.1:8737/embed",
        json.dumps({"sequence": seq}).encode(), {"Content-Type": "application/json"})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=4000) as r:
        json.loads(r.read())
    return time.perf_counter() - t0
cold = embed()            # compiles the 131072-bucket program
warm = [embed() for _ in range(3)]
rec = {"embed_131072_cold_s": round(cold, 2),
       "embed_131072_warm_s": [round(w, 3) for w in warm]}
print(json.dumps(rec))
with open(f"{out}/serve_timing.json", "w") as f:
    json.dump(rec, f)
EOF
kill $SERVE_PID 2>/dev/null || true
echo "done; artifacts in $OUT"
