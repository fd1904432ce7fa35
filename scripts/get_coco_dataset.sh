#!/bin/bash
# Fetch COCO 2014 images + darknet-format labels and build the train/val
# list files this framework's ListDataset consumes (equivalent of the
# reference's data/get_coco_dataset.sh workflow).
#
# Usage: ./scripts/get_coco_dataset.sh [target_dir]
set -euo pipefail

TARGET="${1:-coco}"
mkdir -p "$TARGET"
cd "$TARGET"

echo "downloading COCO 2014 images..."
for f in train2014 val2014; do
  if [ ! -d "images/$f" ]; then
    wget -c "http://images.cocodataset.org/zips/${f}.zip"
    mkdir -p images
    unzip -q "${f}.zip" -d images
    rm -f "${f}.zip"
  fi
done

echo "downloading darknet-format labels + split lists..."
wget -c https://pjreddie.com/media/files/coco/labels.tgz
tar xzf labels.tgz
wget -c https://pjreddie.com/media/files/coco/5k.part
wget -c https://pjreddie.com/media/files/coco/trainvalno5k.part

# absolute-path list files
paste <(awk "{print \"$PWD\"}" <5k.part) 5k.part | tr -d '\t' > 5k.txt
paste <(awk "{print \"$PWD\"}" <trainvalno5k.part) trainvalno5k.part \
  | tr -d '\t' > trainvalno5k.txt

echo "done: $PWD/5k.txt $PWD/trainvalno5k.txt"
