#!/bin/sh
# Download and convert SIFT-1M (reference:
# examples/sift/prepare-dataset.sh). Requires network access.
set -e
wget -c ftp://ftp.irisa.fr/local/texmex/corpus/sift.tar.gz
python convert.py sift.tar.gz
