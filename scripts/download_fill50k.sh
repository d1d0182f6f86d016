#!/bin/bash
# fill50k paired dataset (reference scripts/download_fill50k.sh)
mkdir -p data
wget https://www.cs.cmu.edu/~img2img-turbo/data/my_fill50k.zip -O data/my_fill50k.zip
cd data && unzip my_fill50k.zip && rm my_fill50k.zip
