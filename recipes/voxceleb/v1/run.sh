#!/usr/bin/env bash
# VoxCeleb x-vector recipe — TPU-native pipeline.
#
# Staged like the reference egs/voxceleb/v1/run.sh, but every external Kaldi
# binary is replaced by a framework CLI, and the nj-way CPU job farm by one
# batched TPU program. Inputs expected under $data_root:
#   $data_root/{voxceleb1_dev,voxceleb2,voxceleb1_test}/wav.scp  (+ utt2spk)
#   $data_root/voxceleb1_test/trials   ("enroll test target|nontarget")
set -euo pipefail

stage=${stage:-0}
data_root=${data_root:-data}
exp=${exp:-exp}
config=${config:-recipes/voxceleb/v1/nnet_conf/tdnn_amsoftmax_m0.20_linear_bn_1e-2.json}
model=${model:-$exp/xvector_amsoftmax}
py="python -m"

if [ $stage -le 1 ]; then
  echo "=== stage 1: MFCC (30-dim, 16 kHz) + energy VAD"
  for name in voxceleb1_dev voxceleb2 voxceleb1_test; do
    $py tf_kaldi_speaker_tpu.cli.make_mfcc --compress \
      --num-ceps 30 --num-mel-bins 30 --low-freq 20 --high-freq 7600 \
      "$data_root/$name/wav.scp" "$data_root/$name/mfcc"
    cp "$data_root/$name/utt2spk" "$data_root/$name/mfcc/utt2spk"
    $py tf_kaldi_speaker_tpu.cli.compute_vad \
      "$data_root/$name/mfcc/feats.scp" "$data_root/$name/mfcc"
  done
fi

if [ $stage -le 2 ]; then
  echo "=== stage 2: training egs prep (sliding CMVN + silence removal, compressed)"
  for name in voxceleb1_dev voxceleb2; do
    $py tf_kaldi_speaker_tpu.cli.prepare_feats \
      "$data_root/$name/mfcc" "$data_root/$name/egs"
  done
  # merge dev+voxceleb2 into one train dir
  mkdir -p "$data_root/train_combined"
  for f in feats.scp utt2num_frames utt2spk; do
    cat "$data_root/voxceleb1_dev/egs/$f" "$data_root/voxceleb2/egs/$f" \
      > "$data_root/train_combined/$f"
  done
  python - "$data_root/train_combined" <<'EOF'
import sys, collections, os
d = sys.argv[1]
spk2utt = collections.defaultdict(list)
for line in open(os.path.join(d, "utt2spk")):
    u, s = line.split()
    spk2utt[s].append(u)
with open(os.path.join(d, "spk2utt"), "w") as f:
    for s in sorted(spk2utt):
        f.write("%s %s\n" % (s, " ".join(sorted(spk2utt[s]))))
EOF
fi

if [ $stage -le 3 ]; then
  echo "=== stage 3: filter (min 200 frames, >=8 utts/spk) + valid split + spklist"
  $py tf_kaldi_speaker_tpu.cli.filter_egs_dir --min-len 200 --min-num-utts 8 \
    --valid-speakers 200 --valid-utts 5 \
    "$data_root/train_combined" "$data_root/split"
fi

if [ $stage -le 4 ]; then
  echo "=== stage 4: train ($config)"
  $py tf_kaldi_speaker_tpu.cli.train --config "$config" \
    "$data_root/split/train" "$data_root/split/train/spklist" \
    "$data_root/split/valid" "$data_root/split/train/spklist" \
    "$model"
fi

if [ $stage -le 5 ]; then
  echo "=== stage 5: extract embeddings (best checkpoint, batched on TPU)"
  $py tf_kaldi_speaker_tpu.cli.make_checkpoint --checkpoint -1 "$model"
  for name in voxceleb1_test train_combined; do
    src=$([ "$name" = train_combined ] && echo "$data_root/train_combined" \
                                        || echo "$data_root/$name/mfcc")
    $py tf_kaldi_speaker_tpu.cli.extract --cmvn --vad \
      "$model" "scp:$src/feats.scp" \
      "ark,scp:$exp/xvectors_$name.ark,$exp/xvectors_$name.scp"
  done
fi

if [ $stage -le 6 ]; then
  echo "=== stage 6: scoring (cosine and PLDA) + EER/minDCF"
  $py tf_kaldi_speaker_tpu.cli.score --backend cosine \
    --enroll-scp "$exp/xvectors_voxceleb1_test.scp" \
    --test-scp "$exp/xvectors_voxceleb1_test.scp" \
    --trials "$data_root/voxceleb1_test/trials" \
    --scores "$exp/scores_cosine.txt"
  $py tf_kaldi_speaker_tpu.cli.score --backend plda \
    --enroll-scp "$exp/xvectors_voxceleb1_test.scp" \
    --test-scp "$exp/xvectors_voxceleb1_test.scp" \
    --trials "$data_root/voxceleb1_test/trials" \
    --train-scp "$exp/xvectors_train_combined.scp" \
    --train-utt2spk "$data_root/train_combined/utt2spk" \
    --lda-dim 200 \
    --scores "$exp/scores_plda.txt"
fi
