"""Joint image+caption near-dup clustering (either-modality edges)."""

import pytest

from osmium_tool_spark.operators.dedup import multimodal_near_dup


@pytest.fixture(scope="module")
def images(spark):
    rows = [
        # img1~img2: identical phash (visual dup, rewritten caption)
        ("img1", 0x1234, "png", "a cat sitting on a mat today"),
        ("img2", 0x1234, "png", "completely different words here now"),
        # img3~img4: identical caption (re-encoded image, copied caption)
        ("img3", 0x9999000, "png", "the same caption text for both images"),
        ("img4", 0x7777777, "png", "the same caption text for both images"),
        # img5: unrelated on both modalities
        ("img5", 0x5050505, "png", "nothing matches this one at all"),
        # img6: caption-dup of img2 -> transitively joins the img1 cluster
        ("img6", 0x4444444, "png", "completely different words here now"),
    ]
    return spark.createDataFrame(
        rows, "image_id string, phash long, fmt string, caption string"
    )


def test_either_modality_links_and_transitive_closure(images):
    out = {r["id"]: r for r in multimodal_near_dup(
        images, max_hamming=2, jaccard_threshold=0.6
    ).collect()}
    # visual edge (1-2) + caption edge (2-6) -> one 3-member cluster
    assert out["img1"]["cluster_id"] == out["img2"]["cluster_id"] == out["img6"]["cluster_id"]
    assert out["img1"]["n_members"] == 3
    # representative = min member id
    assert out["img1"]["cluster_id"] == "img1"
    # caption-only cluster
    assert out["img3"]["cluster_id"] == out["img4"]["cluster_id"] == "img3"
    assert out["img3"]["n_members"] == 2
    # unrelated image emits no row
    assert "img5" not in out


def test_numeric_ids_skip_the_mapping(spark):
    rows = [
        (1, 0xAA, "png", "caption one two three four"),
        (2, 0xAA, "png", "other text entirely different"),
        (3, 0xBB, "png", "caption one two three four"),
    ]
    df = spark.createDataFrame(
        rows, "image_id long, phash long, fmt string, caption string"
    )
    out = {r["id"]: r["cluster_id"] for r in multimodal_near_dup(
        df, max_hamming=0, jaccard_threshold=0.9
    ).collect()}
    # 1-2 visual, 1-3 caption -> all one cluster rooted at min id 1
    assert out == {1: 1, 2: 1, 3: 1}
