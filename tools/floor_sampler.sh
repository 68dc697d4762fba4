#!/bin/bash
# Driver-floor sampling profiler (optimization round 13, VERDICT r12 #6):
# jstack the given JVM every ~60 ms and bucket the MAIN thread's stack —
# in local mode, main is where the per-AQE-stage driver floor lives
# (planning, codegen compile, stage submission, result collection; the
# parked gaps are stage-turnaround waits). Usage:
#   tools/floor_sampler.sh <pid> <samples> > profile.txt
pid=$1; n=${2:-300}
declare -A buck
for i in $(seq 1 "$n"); do
  stack=$(jstack "$pid" 2>/dev/null | awk '/^"main"/{f=1} f&&/^$/{exit} f')
  [ -z "$stack" ] && break
  case "$stack" in
    *Janino*|*ClassBodyEvaluator*|*CodeGenerator*|*janino*) b=codegen-compile ;;
    *RuleExecutor*|*Optimizer*|*Analyzer*|*QueryPlanner*|*constraints*) b=plan-optimize ;;
    *ParquetFooterReader*|*InMemoryFileIndex*|*listLeafFiles*|*DataSource*) b=io-metadata ;;
    *executeCollect*|*executeTake*|*collectFromPlan*|*BroadcastExchange*) b=collect-broadcast ;;
    *awaitResult*|*ThreadUtils*|*submitJob*|*runJob*) b=wait-on-stage ;;
    *Unsafe.park*|*Object.wait*) b=parked-other ;;
    *) b=other-runnable ;;
  esac
  buck[$b]=$(( ${buck[$b]:-0} + 1 ))
  sleep 0.05
done
tot=0; for k in "${!buck[@]}"; do tot=$((tot+buck[$k])); done
echo "samples=$tot pid=$pid"
for k in "${!buck[@]}"; do echo "$k ${buck[$k]}"; done | sort -k2 -rn
