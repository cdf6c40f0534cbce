#!/bin/sh
# Regenerate the README quality matrix: domains A/B/C/BC x seeds 101/202
# through the full pipeline (evals/eval_synthetic.py) on the TPU backend.
# Writes one JSON line per run to $1 (default evals/DOMAINS_r5_models.jsonl).
#
# Each episode takes 2-6 min wall in this environment (dominated by relay
# dispatch latency, see BENCH `cli` legs) — run in background:
#   nohup sh evals/run_matrix.sh > /tmp/matrix.log 2>&1 &
set -e
OUT=${1:-evals/DOMAINS_r5_models.jsonl}
: > "$OUT"
for domain in A B C BC; do
  for seed in 101 202; do
    PYTHONPATH=/root/.axon_site:. JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu \
      python evals/eval_synthetic.py "$seed" --domain="$domain" >> "$OUT"
    echo "done: $domain seed $seed" >&2
  done
done
