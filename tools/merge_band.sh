#!/bin/bash
# Fold the live tail-stream + retry checkpoints into the committed
# population and preserve the ε ledger. Safe to run while the fleet is
# hot: every stream checkpoints ATOMICALLY (Campaign.saveCheckpoint's
# rename) before each measurement, so readers always see a complete
# file; CheckpointMerge keeps the first occurrence of a duplicate SQL.
#
# Also folds every .eps sidecar into data/band/eps/ (round-12 verdict:
# the unbiased screen-loss ledger must survive reboots and accumulate
# across rounds). Sidecars are append-only only WITHIN one /tmp
# lifetime — seeds and band filenames recur across rounds, so after a
# reboot a resumed stream recreates the same-named sidecar empty and an
# overwrite copy would truncate the committed ledger (round-13 advice).
# Hence append-merge — and MULTISET append, not sort -u (round-14
# advice): byte-identical eps lines legitimately recur across JVM
# lifetimes (deterministic est from the same model, rt exactly -1.000
# for censored draws, same cap), and collapsing them under-counts
# SCREEN_AUDIT's censored count / loss ratio. comm -13 on sorted copies
# appends each /tmp line only as many times as it EXCEEDS its committed
# count, so repeated merges within one lifetime stay idempotent while
# genuine recurrences accumulate.
#
# Usage: merge_band.sh  (then inspect `git diff --stat data/band` and commit)
set -eu
cd /root/repo
OUT=data/band/campaign_x160_c2.cp
CLASSES=${GRAFT_CLASSES_SNAPSHOT:-/tmp/graft_classes_r16}
inputs=("$OUT")
for f in /tmp/graft_band/tail_*.cp /tmp/graft_band/retry_*.cp; do
  [ -e "$f" ] && inputs+=("$f")
done
echo "merging ${#inputs[@]} checkpoints into $OUT"
java -cp "$CLASSES:/opt/spark/jars/*" graft.tools.CheckpointMerge \
  /tmp/merged_band.cp "${inputs[@]}"
mv /tmp/merged_band.cp "$OUT"
mkdir -p data/band/eps
for f in /tmp/graft_band/*.cp.eps; do
  [ -e "$f" ] || continue
  dst="data/band/eps/$(basename "$f")"
  if [ -e "$dst" ]; then
    # committed lines verbatim + the /tmp multiset's excess; atomic
    # replace so a concurrent reader never sees a partial ledger
    { cat "$dst"; comm -13 <(sort "$dst") <(sort "$f"); } > "$dst.tmp" \
      && mv "$dst.tmp" "$dst"
  else
    cp "$f" "$dst"
  fi
done
head -1 "$OUT"
echo "eps ledger: $(cat data/band/eps/*.eps 2>/dev/null | wc -l) lines committed-side"
