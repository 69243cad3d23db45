#!/usr/bin/env bash
# Real-data acceptance gate (VERDICT r3 #9).
#
# FIRST ACTION ON ANY NETWORKED MACHINE.  The build environment has zero
# egress (BASELINE.md "Real-data status"), so every accuracy claim so far
# rests on the synthetic orbit + the reference-system head-to-head; this
# script is the standing runbook that converts those into paper-comparable
# numbers the moment real data is reachable:
#
#   1. fetch Replica (scripts/download_replica.sh), TUM fr1/desk
#      (scripts/download_tum.sh) and the culled Replica GT meshes
#      (scripts/download_replica_gt_mesh.sh) + pretrained decoders
#      (scripts/download_pretrained.sh);
#   2. run the full SLAM system on all 8 Replica scenes + TUM fr1/desk;
#   3. eval ATE per scene (tools/eval_ate.py) and recon metrics on the
#      Replica meshes (tools/eval_recon.py vs the culled GT);
#   4. emit accept/reject against the paper's numbers (NICE-SLAM,
#      arXiv 2112.12130; BASELINE.md table): Replica avg ATE <= 1.95 cm
#      x1.25 margin, TUM fr1/desk <= 2.7 cm x1.25, Replica depth-L1
#      <= 1.90 cm x1.25 (margins cover seed/stochastic spread, SURVEY
#      §7.3: acceptance is distribution-level).
#
# Usage: scripts/run_real_acceptance.sh [output_root]
set -u  # (not -e: continue past a failing scene, report at the end)

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-$ROOT/output/acceptance}"
mkdir -p "$OUT"
cd "$ROOT"

REPLICA_SCENES="room0 room1 room2 office0 office1 office2 office3 office4"
MARGIN=1.25
REPLICA_GATE_CM=1.95
TUM_GATE_CM=2.7
DEPTH_L1_GATE_CM=1.90

# --- 1. data ---------------------------------------------------------
[ -d Datasets/Replica ]            || bash scripts/download_replica.sh
[ -d Datasets/TUM_RGBD ]           || bash scripts/download_tum.sh
[ -d Datasets/cull_replica_mesh ]  || bash scripts/download_replica_gt_mesh.sh
[ -f pretrained/coarse.pt ]        || bash scripts/download_pretrained.sh

summary="$OUT/summary.tsv"
echo -e "scene\tate_rmse_cm\tdepth_l1_cm\tstatus" > "$summary"

run_scene () {  # $1 = config, $2 = tag, $3 = gt mesh (optional)
    local cfg="$1" tag="$2" gt="${3:-}"
    local out="$OUT/$tag"
    echo "=== $tag : $cfg ==="
    if [ ! -f "$out/ckpts/DONE" ]; then
        python run.py "$cfg" --output "$out" || {
            echo -e "$tag\tNA\tNA\tRUN_FAILED" >> "$summary"; return 1; }
        touch "$out/ckpts/DONE"
    fi
    # tools/eval_ate.py prints `absolute_translational_error.rmse: <m>`
    # in METERS; the table and gates are in cm
    local ate_m ate
    ate_m=$(python tools/eval_ate.py "$cfg" --output "$out" \
            | grep -E '^absolute_translational_error\.rmse:' \
            | grep -oE '[0-9.]+' | head -1)
    ate=$(awk "BEGIN{printf \"%.3f\", ${ate_m:-0} * 100}")
    local l1="NA"
    if [ -n "$gt" ] && [ -f "$gt" ]; then
        l1=$(python tools/eval_recon.py \
             --rec_mesh "$out/mesh/final_mesh_eval_rec.ply" \
             --gt_mesh "$gt" -2d -3d \
             | grep -oE 'depth_l1[^0-9]*[0-9.]+' | grep -oE '[0-9.]+' \
             | head -1 || echo NA)
    fi
    echo -e "$tag\t$ate\t$l1\tOK" >> "$summary"
}

# --- 2./3. runs + eval ----------------------------------------------
for s in $REPLICA_SCENES; do
    run_scene "configs/Replica/$s.yaml" "replica_$s" \
              "Datasets/cull_replica_mesh/${s}.ply"
done
run_scene "configs/TUM_RGBD/freiburg1_desk.yaml" "tum_fr1_desk"

# --- 4. gate ---------------------------------------------------------
python - "$summary" <<EOF
import sys
margin = $MARGIN
rows = [l.strip().split('\t') for l in open(sys.argv[1])][1:]
rep = [float(r[1]) for r in rows if r[0].startswith('replica') and r[3] == 'OK']
tum = [float(r[1]) for r in rows if r[0].startswith('tum') and r[3] == 'OK']
l1s = [float(r[2]) for r in rows
       if r[0].startswith('replica') and r[2] not in ('NA', '') and r[3] == 'OK']
print()
print('scene                ATE cm   depth-L1 cm')
for r in rows:
    print(f'{r[0]:20s} {r[1]:>7s} {r[2]:>12s}  {r[3]}')
ok = True
if len(rep) == 8:
    avg = sum(rep) / len(rep)
    good = avg <= $REPLICA_GATE_CM * margin
    ok &= good
    print(f'Replica avg ATE: {avg:.2f} cm (gate {$REPLICA_GATE_CM} x{margin}) '
          f'{"PASS" if good else "FAIL"}')
else:
    ok = False
    print(f'Replica: only {len(rep)}/8 scenes completed — FAIL')
if tum:
    good = tum[0] <= $TUM_GATE_CM * margin
    ok &= good
    print(f'TUM fr1/desk ATE: {tum[0]:.2f} cm (gate {$TUM_GATE_CM} x{margin}) '
          f'{"PASS" if good else "FAIL"}')
else:
    ok = False
    print('TUM fr1/desk: missing — FAIL')
if l1s:
    avg = sum(l1s) / len(l1s)
    good = avg <= $DEPTH_L1_GATE_CM * margin
    ok &= good
    print(f'Replica avg depth-L1: {avg:.2f} cm (gate {$DEPTH_L1_GATE_CM} '
          f'x{margin}) {"PASS" if good else "FAIL"}')
print('ACCEPTANCE:', 'PASS' if ok else 'FAIL')
sys.exit(0 if ok else 1)
EOF
