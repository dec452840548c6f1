#!/bin/sh
# Download and convert GloVe twitter-27B 100d (reference:
# examples/glove/prepare-dataset.sh). Requires network access.
set -e
wget -c https://nlp.stanford.edu/data/glove.twitter.27B.zip
unzip -o glove.twitter.27B.zip glove.twitter.27B.100d.txt
python convert.py glove.twitter.27B.100d.txt glove.twitter.27B.100d.npy
