#!/usr/bin/env bash
set -euo pipefail
RESULTS_DIR=${1:?results_dir}
python -m kvcache_factory_tpu.evals.score --results_dir "$RESULTS_DIR" --suite ruler
