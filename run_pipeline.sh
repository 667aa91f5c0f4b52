#!/usr/bin/env bash
# End-to-end pipeline: train -> locate best checkpoint -> test -> visualize.
# Capability parity with /root/reference/run_pipeline.sh (config variables at the
# top, auto-discovery of the newest experiment's best_model, pipeline_config.txt),
# driving the TPU-native CLIs.
set -euo pipefail

# ============================= CONFIGURATION =================================
DATASET="${DATASET:-mvtec}"            # mvtec | gear | kolektorsdd
DATA_ROOT="${DATA_ROOT:-datasets/mvtec_anomaly_detection}"
CATEGORY="${CATEGORY:-bottle}"         # (mvtec only)
MODEL="${MODEL:-anomaly_unet}"         # mvtec: unet|anomaly_unet ; seg: unet|seg_unet|unetpp|attn_unet
DEEP_SUPERVISION="${DEEP_SUPERVISION:-0}"  # seg unetpp: train/test/visualize with DS heads
HEADS="${HEADS:-4}"                    # seg unetpp DS eval/viz: 4=accurate, k<4=pruned X[0][k]
IMAGE_SIZE="${IMAGE_SIZE:-256}"
EPOCHS="${EPOCHS:-100}"
BATCH_SIZE="${BATCH_SIZE:-16}"
LEARNING_RATE="${LEARNING_RATE:-1e-3}"
OPTIMIZER="${OPTIMIZER:-adam}"
PRECISION="${PRECISION:-bf16}"
SAVE_DIR="${SAVE_DIR:-outputs}"
TEST_DIR="${TEST_DIR:-test_results}"
VIS_DIR="${VIS_DIR:-visualizations}"
EXTRA_TRAIN_ARGS="${EXTRA_TRAIN_ARGS:-}"
EXTRA_TEST_ARGS="${EXTRA_TEST_ARGS:-}"
EXTRA_VIS_ARGS="${EXTRA_VIS_ARGS:-}"
EXTRA_SERVE_ARGS="${EXTRA_SERVE_ARGS:-}"
SKIP_TRAIN="${SKIP_TRAIN:-0}"
SERVE_DIR="${SERVE_DIR:-}"             # optional: directory of images -> serving stage
QUANTIZE="${QUANTIZE:-none}"           # serving precision: none | int8
EXPORT_ARTIFACT="${EXPORT_ARTIFACT:-}" # optional: dir -> AOT serving artifact
BUCKET_SIZES="${BUCKET_SIZES:-}"       # optional: batch-shape ladder, e.g. "1,4"
# =============================================================================

STAGES=3; [[ -n "$SERVE_DIR" ]] && STAGES=4

TS=$(date +%Y%m%d_%H%M%S)
mkdir -p "$SAVE_DIR"
{
  echo "pipeline started: $TS"
  echo "dataset=$DATASET data_root=$DATA_ROOT category=$CATEGORY model=$MODEL"
  echo "image_size=$IMAGE_SIZE epochs=$EPOCHS batch=$BATCH_SIZE lr=$LEARNING_RATE"
  echo "optimizer=$OPTIMIZER precision=$PRECISION"
} > "$SAVE_DIR/pipeline_config.txt"

case "$DATASET" in
  mvtec)
    TRAIN_MOD=tpu_unet.cli.train_mvtec
    TEST_MOD=tpu_unet.cli.test_mvtec
    TRAIN_ARGS=(--data_root "$DATA_ROOT" --category "$CATEGORY" --model "$MODEL"
                --image_size "$IMAGE_SIZE" --epochs "$EPOCHS"
                --batch_size "$BATCH_SIZE" --learning_rate "$LEARNING_RATE"
                --optimizer "$OPTIMIZER" --precision "$PRECISION"
                --save_dir "$SAVE_DIR")
    EXP_GLOB="${CATEGORY}_${MODEL}_*"
    ;;
  gear)
    TRAIN_MOD=tpu_unet.cli.train_gear
    TEST_MOD=tpu_unet.cli.test_gear
    TRAIN_ARGS=(--data_root "$DATA_ROOT" --model "$MODEL"
                --image_size "$IMAGE_SIZE" --epochs "$EPOCHS"
                --batch_size "$BATCH_SIZE" --learning_rate "$LEARNING_RATE"
                --optimizer "$OPTIMIZER" --precision "$PRECISION"
                --save_dir "$SAVE_DIR")
    EXP_GLOB="gear_seg_${MODEL}_*"
    ;;
  kolektorsdd)
    TRAIN_MOD=tpu_unet.cli.train_kolektorsdd
    TEST_MOD=tpu_unet.cli.test_kolektorsdd
    TRAIN_ARGS=(--data_root "$DATA_ROOT" --model "$MODEL"
                --epochs "$EPOCHS" --batch_size "$BATCH_SIZE"
                --learning_rate "$LEARNING_RATE" --optimizer "$OPTIMIZER"
                --precision "$PRECISION" --save_dir "$SAVE_DIR")
    EXP_GLOB="kolektorsdd_${MODEL}_*"
    ;;
  *) echo "Unknown DATASET: $DATASET"; exit 1 ;;
esac

# UNet++ deep-supervision knobs ride every stage that rebuilds the model; the
# pruned --heads selection applies to eval/visualize only (training always
# optimizes all heads).
DS_ARGS=()
HEADS_ARGS=()
if [[ "$DEEP_SUPERVISION" == "1" ]]; then
  DS_ARGS=(--deep_supervision)
fi
if [[ "$HEADS" != "4" ]]; then
  HEADS_ARGS=(--heads "$HEADS")
fi
if [[ "$DATASET" != "mvtec" && ${#DS_ARGS[@]} -gt 0 ]]; then
  TRAIN_ARGS+=("${DS_ARGS[@]}")
fi

if [[ "$SKIP_TRAIN" != "1" ]]; then
  echo "=== [1/$STAGES] Training ==="
  # shellcheck disable=SC2086
  python -m "$TRAIN_MOD" "${TRAIN_ARGS[@]}" $EXTRA_TRAIN_ARGS
fi

echo "=== locating latest experiment + best checkpoint ==="
LATEST_EXPERIMENT=$(ls -dt "$SAVE_DIR"/$EXP_GLOB 2>/dev/null | head -1 || true)
if [[ -z "$LATEST_EXPERIMENT" ]]; then
  echo "No experiment directory matching $SAVE_DIR/$EXP_GLOB"; exit 1
fi
BEST="$LATEST_EXPERIMENT/checkpoints/best_model"
if [[ ! -d "$BEST" ]]; then
  BEST=$(ls -dt "$LATEST_EXPERIMENT"/checkpoints/checkpoint_epoch_* 2>/dev/null | head -1 || true)
fi
if [[ -z "$BEST" ]]; then
  echo "No checkpoint found in $LATEST_EXPERIMENT/checkpoints"; exit 1
fi
echo "Experiment: $LATEST_EXPERIMENT"
echo "Checkpoint: $BEST"

echo "=== [2/$STAGES] Testing ==="
case "$DATASET" in
  mvtec)
    # shellcheck disable=SC2086
    python -m "$TEST_MOD" --data_root "$DATA_ROOT" --category "$CATEGORY" \
      --model "$MODEL" --image_size "$IMAGE_SIZE" --batch_size "$BATCH_SIZE" \
      --checkpoint "$BEST" --output_dir "$TEST_DIR" --precision "$PRECISION" \
      --save_visualizations $EXTRA_TEST_ARGS
    ;;
  gear)
    # shellcheck disable=SC2086
    python -m "$TEST_MOD" --data_root "$DATA_ROOT" --model "$MODEL" \
      --image_size "$IMAGE_SIZE" --batch_size "$BATCH_SIZE" \
      --checkpoint "$BEST" --output_dir "$TEST_DIR/gear" --precision "$PRECISION" \
      --save_predictions ${DS_ARGS[@]+"${DS_ARGS[@]}"} \
      ${HEADS_ARGS[@]+"${HEADS_ARGS[@]}"} $EXTRA_TEST_ARGS
    ;;
  kolektorsdd)
    # shellcheck disable=SC2086
    python -m "$TEST_MOD" --data_root "$DATA_ROOT" --model "$MODEL" \
      --batch_size "$BATCH_SIZE" --checkpoint "$BEST" \
      --output_dir "$TEST_DIR/kolektorsdd" --precision "$PRECISION" \
      --save_predictions ${DS_ARGS[@]+"${DS_ARGS[@]}"} \
      ${HEADS_ARGS[@]+"${HEADS_ARGS[@]}"} $EXTRA_TEST_ARGS
    ;;
esac

echo "=== [3/$STAGES] Visualizing ==="
case "$DATASET" in
  mvtec)
    # shellcheck disable=SC2086
    python -m tpu_unet.cli.visualize_mvtec --data_root "$DATA_ROOT" \
      --category "$CATEGORY" --model "$MODEL" --image_size "$IMAGE_SIZE" \
      --checkpoint "$BEST" --output_dir "$VIS_DIR" --precision "$PRECISION" \
      $EXTRA_VIS_ARGS
    ;;
  gear)
    # shellcheck disable=SC2086
    python -m tpu_unet.cli.visualize_seg --dataset gear --data_root "$DATA_ROOT" \
      --model "$MODEL" --image_size "$IMAGE_SIZE" --checkpoint "$BEST" \
      --output_dir "$VIS_DIR" --precision "$PRECISION" \
      ${DS_ARGS[@]+"${DS_ARGS[@]}"} ${HEADS_ARGS[@]+"${HEADS_ARGS[@]}"} \
      $EXTRA_VIS_ARGS
    ;;
  kolektorsdd)
    # shellcheck disable=SC2086
    python -m tpu_unet.cli.visualize_seg --dataset kolektorsdd --data_root "$DATA_ROOT" \
      --model "$MODEL" --checkpoint "$BEST" --output_dir "$VIS_DIR" \
      --precision "$PRECISION" ${DS_ARGS[@]+"${DS_ARGS[@]}"} \
      ${HEADS_ARGS[@]+"${HEADS_ARGS[@]}"} $EXTRA_VIS_ARGS
    ;;
esac

if [[ -n "$SERVE_DIR" ]]; then
  echo "=== [4/$STAGES] Serving $SERVE_DIR ==="
  QARGS=()
  if [[ "$QUANTIZE" == "int8" ]]; then
    # CALIB_DIR env overrides the per-dataset default calibration folder.
    if [[ -n "${CALIB_DIR:-}" ]]; then
      QARGS=(--quantize int8 --calib_dir "$CALIB_DIR")
    else
      case "$DATASET" in
        mvtec)       QARGS=(--quantize int8 --calib_dir "$DATA_ROOT/$CATEGORY/train/good") ;;
        # KolektorSDD has no images/ subdir — its jpgs live in kos*/ folders,
        # which serve_seg's recursive image walk picks up from the root.
        kolektorsdd) QARGS=(--quantize int8 --calib_dir "$DATA_ROOT") ;;
        *)           QARGS=(--quantize int8 --calib_dir "$DATA_ROOT/images/train") ;;
      esac
    fi
  fi
  # After the int8 block: that branch ASSIGNS QARGS, it doesn't append.
  [[ -n "$EXPORT_ARTIFACT" ]] && QARGS+=(--export_artifact "$EXPORT_ARTIFACT")
  [[ -n "$BUCKET_SIZES" ]] && QARGS+=(--bucket_sizes "$BUCKET_SIZES")
  case "$DATASET" in
    mvtec)
      # shellcheck disable=SC2086
      python -m tpu_unet.cli.serve_mvtec --checkpoint "$BEST" \
        --input_dir "$SERVE_DIR" --image_size "$IMAGE_SIZE" \
        --output "$TEST_DIR/scores.json" "${QARGS[@]}" $EXTRA_SERVE_ARGS
      ;;
    gear)
      # shellcheck disable=SC2086
      python -m tpu_unet.cli.serve_seg --checkpoint "$BEST" \
        --input_dir "$SERVE_DIR" --num_classes 4 \
        --image_height "$IMAGE_SIZE" --image_width "$IMAGE_SIZE" \
        --output_dir "$TEST_DIR/served_masks" "${QARGS[@]}" $EXTRA_SERVE_ARGS
      ;;
    kolektorsdd)
      # shellcheck disable=SC2086
      python -m tpu_unet.cli.serve_seg --checkpoint "$BEST" \
        --input_dir "$SERVE_DIR" --num_classes 3 \
        --image_height 1024 --image_width 512 \
        --output_dir "$TEST_DIR/served_masks" "${QARGS[@]}" $EXTRA_SERVE_ARGS
      ;;
  esac
fi

echo "Pipeline completed. Experiment: $LATEST_EXPERIMENT"
