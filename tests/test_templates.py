"""Prompt-template registry parity against the reference constants
(cat_seg/third_party/imagenet_templates.py)."""

import ast
import os

import pytest

from catseg_tpu.text import templates

_REF = "/root/reference/cat_seg/third_party/imagenet_templates.py"


def _ref_list(name):
    tree = ast.parse(open(_REF).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == name for t in node.targets
        ):
            return [ast.literal_eval(e) for e in node.value.elts]
    raise KeyError(name)


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not present")
@pytest.mark.parametrize(
    "ours,ref_name",
    [
        ("imagenet", "IMAGENET_TEMPLATES"),
        ("imagenet_select", "IMAGENET_TEMPLATES_SELECT"),
        ("vild", "ViLD_templates"),
    ],
)
def test_template_sets_match_reference(ours, ref_name):
    assert list(templates.get(ours)) == _ref_list(ref_name)


def test_registry_covers_every_reference_set():
    assert set(templates.SETS) >= {"single", "imagenet", "imagenet_select",
                                   "rs", "rs_all", "vild"}
    assert len(templates.get("vild")) == 63
    assert len(templates.get("imagenet")) == 80
    assert len(templates.get("imagenet_select")) == 8


def test_format_template_article_rule():
    assert templates.format_template("a photo of {article} {category}.", "orange") == \
        "a photo of an orange."
    assert templates.format_template("a photo of {article} {category}.", "dog") == \
        "a photo of a dog."
    assert templates.format_template("a photo of a {}.", "dog") == "a photo of a dog."
