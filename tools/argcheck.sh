#!/usr/bin/env bash
# Non-default-argument oracle gate (r9 verdict #4): run every templated
# arg family at >=2 non-default argument points through graft.Verify's
# name@key=val channel and hash-compare against the arg-templated
# DuckDB oracle. Usage: tools/argcheck.sh [SF_DIR] [OUT_DIR]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/graft_argcheck}"
SPECS=(
  'grep@pattern=data' 'grep@pattern=proc'
  'results_limit@limit=7' 'results_limit@limit=50'
  'bigrams@top_n=25' 'bigrams@top_n=7'
  'events_rolling_24h@window_hours=6' 'events_rolling_24h@window_hours=48'
  'events_heavy_hitters@k=50' 'events_heavy_hitters@k=300'
  'group_sample@k=1' 'group_sample@k=5'
  'multi_touch_attribution@window_days=2'
  'multi_touch_attribution@window_days=14,salt_bins=4'
  'multi_touch_attribution@clicks_cap=3'
  'multi_touch_attribution@window_days=14,clicks_cap=1,salt_bins=4'
  'basket_rules@top_n=20' 'basket_rules@top_n=80,max_basket=128'
  'late_order_priority@lag_days=30' 'late_order_priority@lag_days=180'
  'waiting_supplier@lag_days=60' 'waiting_supplier@lag_days=365'
  'kcore_graph@core_k=2' 'kcore_graph@core_k=4,peels=6'
  'token_histogram@bin_tokens=32' 'token_histogram@bin_tokens=128'
  'events_late_audit@delay_minutes=5'
  'events_late_audit@delay_minutes=240,jitter_minutes=30'
  'watermark_delay_curve@jitter_minutes=30'
  'watermark_delay_curve@jitter_minutes=600'
  'substring_dedup@stride=4' 'substring_dedup@stride=16'
  'knn_clustering_coeff@k=2' 'knn_clustering_coeff@k=4'
  'cluster_balanced_sample@alpha=0.25' 'cluster_balanced_sample@alpha=1.0'
  'label_propagation@edges=mutual' 'label_propagation@iters=1,mask_mod=2'
  'knn_components@edges=mutual' 'knn_components@k=5'
  'market_share@nation=NATION_3' 'market_share@region=ASIA,ptype=ECONOMY'
  'large_volume_customers@min_qty=150' 'large_volume_customers@min_qty=300,top_n=20'
  'part_link_prediction@top_q=8' 'part_link_prediction@top_q=64,top_n=20'
  'shard_plan@shard_tokens=1024' 'shard_plan@shard_tokens=16384'
  'part_name_profit@pattern=widget' 'part_name_profit@pattern=small'
  'semantic_decontamination@tau=0.3' 'semantic_decontamination@tau=0.6'
  'semantic_decontamination_delta@tau=0.3'
  'semantic_decontamination_delta@delta_mod=7,tau=0.6'
  'ingest_drift@delta_mod=4' 'ingest_drift@delta_mod=25'
  'decont_gate_replay@tau=0.3' 'decont_gate_replay@delta_mod=7,tau=0.6'
  'dedup_gate_replay@delta_mod=4' 'dedup_gate_replay@delta_mod=7'
  'quality_drift@delta_mod=4' 'quality_drift_replay@delta_mod=7'
  'ingest_drift_replay@delta_mod=4' 'ingest_drift_replay@delta_mod=25'
  'crossmodal_retrieval@modality=audio' 'crossmodal_retrieval@k=3'
  'local_supplier_volume@region=EUROPE' 'local_supplier_volume@region=AFRICA'
  'nation_trade_volume@nation1=NATION_0,nation2=NATION_12'
  'nation_trade_volume@nation2=NATION_24'
)
tools/run.sh graft.Verify "$SF" "$OUT" "${SPECS[@]}" 2>&1 \
  | grep -E '\[verify\].*failed' || true
exec python3 tools/check.py "$SF" "$OUT" "${SPECS[@]}"
