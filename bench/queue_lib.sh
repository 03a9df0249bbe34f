# Shared helpers for the canary-gated hardware-evidence queues.
# Source from a queue script after cd'ing to the repo root:
#   cd "$(dirname "$0")/.." || exit 1
#   . bench/queue_lib.sh

wait_tunnel() {
  local n=0
  while true; do
    if timeout 300 python bench.py --child canary 2>/dev/null | grep -q '"ok": true'; then
      echo "# $(date +%T) canary ok" >&2
      return 0
    fi
    n=$((n + 1))
    echo "# $(date +%T) tunnel dead (probe $n); sleeping 180" >&2
    sleep 180
  done
}

# run_job <name> <timeout_s> <cmd...>: canary-gate, run under timeout,
# log to /tmp/r4_<name>.log, never abort the queue on failure.
run_job() {
  local name=$1 to=$2
  shift 2
  wait_tunnel
  echo "# $(date +%T) starting $name: $*" >&2
  timeout "$to" "$@" >"/tmp/r4_${name}.log" 2>&1
  echo "# $(date +%T) $name rc=$?" >&2
}
