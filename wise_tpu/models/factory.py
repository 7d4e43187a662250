"""Feature extractor factory.

Routes 4-token ids to extractor classes (reference contract:
/root/reference/src/feature/feature_extractor_factory.py:4-27):

- ``mlfoundations/open_clip/<model>/<pretrained>`` -> JAX OpenCLIP-compatible
- ``microsoft/clap/<version>/<variant>``           -> JAX CLAP-compatible
- ``wise/random_features/<dim>/<label>``           -> deterministic fake
"""

from __future__ import annotations


def FeatureExtractorFactory(id: str):
    # reference factory docstring documents __RANDOM_<dim>__ debug ids
    # (src/feature/feature_extractor_factory.py:14)
    import re

    m = re.fullmatch(r"__RANDOM_(\d+)__", id)
    if m:
        from .random_features import RandomFeatures

        return RandomFeatures(f"wise/random_features/{m.group(1)}/default")
    if len(id.split("/")) != 4:
        raise ValueError(
            "Feature extractor id must be formatted as "
            "MODEL_CREATOR_NAMESPACE/MODEL_CREATOR/MODEL_NAME/PRETRAINING_DATASET, "
            'e.g. "mlfoundations/open_clip/ViT-B-32/laion2b_s34b_b79k" or '
            '"wise/random_features/512/test"'
        )
    if id.startswith("wise/random_features/"):
        from .random_features import RandomFeatures

        return RandomFeatures(id)
    if id.startswith("mlfoundations/open_clip/"):
        from .clip import OpenClipExtractor

        return OpenClipExtractor(id)
    if id.startswith("microsoft/clap/"):
        from .clap import ClapExtractor

        return ClapExtractor(id)
    raise ValueError(f"Unknown feature extractor id {id}")
