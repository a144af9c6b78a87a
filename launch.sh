#!/bin/bash
# SLURM resource headers (honored when submitted with sbatch, inert when run
# directly). TPU counterpart of the reference's sbatch.sh:1-12 GPU request:
# one TPU-VM host driving its attached chips, CPU workers for datagen/IO.
#SBATCH --partition=tpu
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=8
#SBATCH --mem=32G
#SBATCH --time=20:00:00
#SBATCH --output=job_logs/out_%x_%j.log
#
# Staged experiment launcher — TPU-VM equivalent of the reference's
# SLURM/Singularity sbatch.sh: runs any combination of the
# generate_data / train / inference / evaluate / compare stages for one
# experiment. On a SLURM-managed TPU pod this script can be submitted with
# sbatch directly; locally it just runs the stages in order.
#
# Usage:
#   ./launch.sh -x <experiment> [-g "<generate args>"] [-t "<train args>"]
#               [-i "<inference args>"] [-e "<evaluate args>"] [-c "<compare args>"]
# Example:
#   ./launch.sh -x duct_fixed_boundary \
#       -t "--model pipn --name pipn-run --epochs 3000 --n-internal 1500 --n-boundary 1000 --n-observations 700" \
#       -e "--save-plots"
set -e

REPO_DIR="$(cd "$(dirname "$0")" && pwd)"
EXPERIMENT=""
declare -A STAGE_ARGS
RUN_STAGES=()

while getopts "x:g:t:i:e:c:" opt; do
  case $opt in
    x) EXPERIMENT="$OPTARG" ;;
    g) RUN_STAGES+=("generate_data"); STAGE_ARGS[generate_data]="$OPTARG" ;;
    t) RUN_STAGES+=("train");         STAGE_ARGS[train]="$OPTARG" ;;
    i) RUN_STAGES+=("inference");     STAGE_ARGS[inference]="$OPTARG" ;;
    e) RUN_STAGES+=("evaluate");      STAGE_ARGS[evaluate]="$OPTARG" ;;
    c) RUN_STAGES+=("compare");       STAGE_ARGS[compare]="$OPTARG" ;;
    *) echo "unknown option"; exit 1 ;;
  esac
done

if [ -z "$EXPERIMENT" ]; then
  echo "usage: $0 -x <experiment> [-g|-t|-i|-e|-c \"args\"]"
  exit 1
fi

export PYTHONPATH="$REPO_DIR${PYTHONPATH:+:$PYTHONPATH}"

for stage in "${RUN_STAGES[@]}"; do
  echo "=== $EXPERIMENT :: $stage ${STAGE_ARGS[$stage]}"
  # shellcheck disable=SC2086
  EXPERIMENT="$EXPERIMENT" RUNCMD="$stage" \
    python "$REPO_DIR/run_experiment.py" ${STAGE_ARGS[$stage]}
done
