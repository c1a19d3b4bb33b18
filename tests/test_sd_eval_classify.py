"""imageclassify CLI: reference output schema on the prompts-merge path
(SD/eval-scripts/imageclassify.py:40-111). torchvision is not installed
here, so this drives our driver end-to-end on tiny synthetic images with a
random-init classifier and asserts the schema + merge semantics the
reference produces: softmax top-k scores/indices/categories merged into the
prompts CSV by case_number parsed from ``{case}_{i}.png`` filenames."""

import numpy as np
import pytest

pd = pytest.importorskip("pandas")
PIL = pytest.importorskip("PIL")


@pytest.fixture(scope="module")
def img_folder(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("gen")
    # two images for case 0, one for case 3; non-square to exercise the
    # resize-shortest-edge-232 → center-crop-224 preprocess; a non-image
    # file that must be ignored
    for name in ["0_0.png", "0_1.png", "3_0.png"]:
        Image.fromarray(rng.integers(0, 255, (40, 30, 3), dtype=np.uint8)
                        ).resize((240, 250)).save(d / name)
    (d / "config.txt").write_text("ignore me")
    return d


def test_imageclassify_merged_schema(img_folder, tmp_path, capsys):
    from salun.cli import sd_eval

    prompts = tmp_path / "prompts.csv"
    pd.DataFrame({
        "case_number": [0, 3, 7],
        "prompt": ["Image of tench", "Image of chain saw", "unused"],
        "evaluation_seed": [1, 2, 3],
        "class": ["tench", "chain saw", "x"],
        "classidx": [0, 491, 5],
    }).to_csv(prompts, index=False)
    out = tmp_path / "cls.csv"

    sd_eval.main(["imageclassify", "--folder_path", str(img_folder),
                  "--prompts_path", str(prompts),
                  "--save_path", str(out), "--topk", "2",
                  "--batch_size", "2"])

    df = pd.read_csv(out, index_col=0)
    for k in (1, 2):
        for col in (f"category_top{k}", f"index_top{k}", f"scores_top{k}"):
            assert col in df.columns, col
    # merge semantics: case 0 appears twice (two images), case 3 once,
    # case 7 (no image) is dropped by the inner join
    assert sorted(df.case_number.tolist()) == [0, 0, 3]
    # softmax top-k is ordered and in (0, 1)
    assert (df.scores_top1 >= df.scores_top2).all()
    assert ((df.scores_top1 > 0) & (df.scores_top1 < 1)).all()
    assert df.index_top1.between(0, 999).all()
    # no --categories file → the index doubles as the category name
    assert (df.category_top1.astype(str) ==
            df.index_top1.astype(str)).all()
    # the convenience UA line is printed when classidx is present
    assert "UA" in capsys.readouterr().out


def test_imageclassify_per_image_fallback(img_folder, tmp_path):
    from salun.cli import sd_eval

    out = tmp_path / "cls.csv"
    cats = tmp_path / "cats.txt"
    cats.write_text("\n".join(f"name_{i}" for i in range(1000)) + "\n")
    sd_eval.main(["imageclassify", "--folder_path", str(img_folder),
                  "--save_path", str(out), "--topk", "1",
                  "--categories", str(cats), "--batch_size", "4"])
    df = pd.read_csv(out)
    assert df.image.tolist() == ["0_0.png", "0_1.png", "3_0.png"]
    assert (df.category_top1 == [f"name_{i}" for i in df.index_top1]).all()
