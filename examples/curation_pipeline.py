"""End-to-end web-corpus curation: quality gate -> dedup -> split.

    python examples/curation_pipeline.py [sf_dir]

The 100 TB shape in miniature: stream pages, score quality (map-only),
drop near-duplicates (MinHash-LSH, ints-only exchange), assign
content-addressed train/val/test splits, and write partitioned parquet
with resume manifests."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))          # run from anywhere, no install


import ray

from shapefile_rs_ray.pipelines.curation import stratified_split
from shapefile_rs_ray.sources.webpages import read_webpages
from shapefile_rs_ray.stages.dedup import minhash_lsh_pairs


def main(sf_dir: str) -> None:
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    pages = read_webpages(sf_dir, with_html=False)
    pairs = minhash_lsh_pairs(pages, id_col="page_id", text_col="text")
    print("near-dup pairs:", pairs.count())
    split = stratified_split(pages)
    for row in split.take_all():
        print(row)
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
