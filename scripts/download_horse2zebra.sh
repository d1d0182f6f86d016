#!/bin/bash
# horse2zebra unpaired dataset (reference scripts/download_horse2zebra.sh)
mkdir -p data
wget https://www.cs.cmu.edu/~img2img-turbo/data/my_horse2zebra.zip -O data/my_horse2zebra.zip
cd data && unzip my_horse2zebra.zip && rm my_horse2zebra.zip
