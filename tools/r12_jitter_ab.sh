#!/bin/bash
# Round-12 adjudication of the six r10->r11 jitter-class artifact
# regressions (VERDICT r11 item 6): same-window A/B, r10 HEAD
# (/tmp/r10head) vs r11 HEAD (/tmp/r11head), warm floors via QProbe.
# Usage: tools/r12_jitter_ab.sh > /tmp/jitter_ab.log 2>&1
set -u
ADDOPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
  java.net java.nio java.util java.util.concurrent \
  java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action \
  sun.util.calendar; do echo --add-opens java.base/$p=ALL-UNNAMED; done)
CELLS="e13_stream_dedup q44_cdc_stream s13_ann_compact e7_stream_funnel q17_rollup d15_cluster_census"
for c in $CELLS; do
  for side in r10head r11head; do
    echo "== $c @ $side =="
    java $ADDOPENS -Xmx8g \
      -cp "/tmp/$side/target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.bench.QProbe "$c" /root/testdata/sf0.1 2>/dev/null | tail -3
  done
done
echo JITTER_DONE
