"""DataConfiguration -> dataset/loader construction (reference BuildData stack,
common/trainloop/data.py:12-154 + factory.py registries).

Differences by design (TPU-first, channels-last):
- torch layout transforms in existing configs (``permute [2,0,1]``,
  ``squeeze``, ``unsqueeze``) are recognized and skipped — data flows NHWC;
- pymia sampler/loader machinery collapses into :class:`SliceBatchLoader`
  (static shapes, ragged tail padded + masked);
- the selection sampler's crc32 index cache is kept 1:1
  (data/indexing.calculate_or_load_indices).

Extractor-registry mapping (reference factory.py:30-57 — every entry has a
structural equivalent; none needs a dedicated class here):
  names/subject  -> ``direct_subject_info`` / loader ``subject_index`` column
  data           -> loader ``categories`` (all store categories by default)
  selective      -> loader ``categories`` restricted to a subset
  pad (recursion)-> ``PatchWiseIndexing(pad=...)`` halo extraction
  shape/properties/files -> ``direct_subject_info`` / ``dataset.properties``
  indexing       -> loader ``slice_index`` column (assembler metadata)
  random         -> shuffled loader order (per-epoch reseeded)
"""
from __future__ import annotations

import dataclasses
import typing

from rcu_tpu.data import indexing as idx_lib
from rcu_tpu.data import transforms as tfm_lib
from rcu_tpu.data.h5 import SubjectDataset
from rcu_tpu.data.isic import IsicFolderDataset
from rcu_tpu.data.loader import SliceBatchLoader
from rcu_tpu.engine.config import DataConfiguration, ParametricNode

_LAYOUT_NOOPS = {"permute", "squeeze", "unsqueeze"}


def build_transform(nodes: typing.Optional[list]):
    if not nodes:
        return None
    transforms = []
    for node in nodes:
        node = ParametricNode.parse(node)
        if node.type in _LAYOUT_NOOPS:
            continue  # torch-layout artifact; NHWC end-to-end here
        if node.type == "rescale":
            p = dict(node.params)
            entries = p.pop("entries", None)
            kwargs = {k: p.pop(k)
                      for k in ("lower", "upper", "old_min", "old_max")
                      if k in p}
            if p:  # a typo'd/unsupported param must not silently no-op
                raise ValueError(f"unknown rescale params: {sorted(p)}")
            transforms.append(tfm_lib.Rescale(entries=entries, **kwargs))
        elif node.type == "size":
            p = dict(node.params)
            if "size" not in p:
                raise ValueError('size transform needs a "size" param')
            size, entries = p.pop("size"), p.pop("entries", None)
            if p:  # same strictness as rescale: typos must not no-op
                raise ValueError(f"unknown size params: {sorted(p)}")
            transforms.append(tfm_lib.Size(size, entries=entries))
        elif node.type == "relabel":
            p = dict(node.params)
            if "label_changes" not in p:
                raise ValueError(
                    'relabel transform needs a "label_changes" param')
            changes = p.pop("label_changes")
            entries = p.pop("entries", ("labels",))
            if p:
                raise ValueError(f"unknown relabel params: {sorted(p)}")
            transforms.append(tfm_lib.Relabel(changes, entries=entries))
        else:
            raise ValueError(f'unknown transform "{node.type}"')
    return tfm_lib.Compose(transforms) if transforms else None


def build_indexing(node: typing.Optional[ParametricNode]):
    if node is None:
        return idx_lib.EmptyIndexing()
    if node.type == "slice":
        return idx_lib.SliceIndexing()
    if node.type == "empty":
        return idx_lib.EmptyIndexing()
    if node.type == "patch":
        return idx_lib.PatchWiseIndexing(
            node.params.get("patch_shape", (128, 128)),
            pad=node.params.get("pad", (0, 0)))
    raise ValueError(f'unknown indexing "{node.type}"')


def build_assembler(dataset, indexing_node, entries):
    """Assembler matched to the indexing strategy (shared by the train
    validation loop and the test loop so the mapping cannot drift)."""
    from rcu_tpu.data.assembler import (PatchAssembler, Subject2dAssembler,
                                        SubjectAssembler)
    indexing = build_indexing(indexing_node)
    if isinstance(indexing, idx_lib.SliceIndexing):
        return SubjectAssembler(dataset, entries)
    if isinstance(indexing, idx_lib.PatchWiseIndexing):
        return PatchAssembler(dataset, indexing, entries)
    return Subject2dAssembler(dataset, entries)


def build_selection(node: typing.Optional[ParametricNode],
                    selection_extractor: typing.Optional[ParametricNode]):
    if node is None:
        return None, ("images",)
    categories = ("images",)
    if selection_extractor is not None and selection_extractor.params:
        categories = tuple(selection_extractor.params.get("categories", categories))
    if node.type == "none-black":
        return idx_lib.NoneBlackSelection(category=categories[0]), categories
    if node.type == "with-foreground":
        return idx_lib.WithForegroundSelection(), ("labels",)
    raise ValueError(f'unknown selection strategy "{node.type}"')


def build_dataset(data_config: DataConfiguration, subjects=None,
                  prediction_dir: str = None):
    path = data_config.dataset
    if str(path).endswith(".h5"):
        return SubjectDataset(path, subject_subset=subjects)
    # opt-in: superpixels cost host IO + transfer on every batch, so they are
    # only loaded when the data config asks for them
    with_superpixels = bool(data_config.others.get("with_superpixels", False))
    return IsicFolderDataset(path, subject_subset=subjects,
                             prediction_dir=prediction_dir,
                             with_superpixels=with_superpixels)


@dataclasses.dataclass
class Data:
    """Dataset + loader + nb_batches (reference data.py:12-17)."""
    dataset: object
    loader: SliceBatchLoader
    nb_batches: int


def build_data(data_config: DataConfiguration, subjects=None, seed: int = 0,
               batch_size: int = None, prediction_dir: str = None) -> Data:
    dataset = build_dataset(data_config, subjects, prediction_dir)
    if not dataset.subjects:
        # every consumer probes subjects[0] (categories, indexing, shape
        # peeks) — fail here with the cause, not an opaque IndexError.
        # (A non-empty selection with missing members already raised in the
        # dataset ctor, so a non-None `subjects` here was an empty list.)
        raise ValueError(
            f"no subjects: the dataset {data_config.dataset!r} "
            + ("with an empty subject selection "
               if subjects is not None else "")
            + "resolved to zero subjects")
    indexing = build_indexing(data_config.indexing)
    transform = build_transform(data_config.transform)

    selection, categories = build_selection(data_config.selection_strategy,
                                            data_config.selection_extractor)
    if selection is not None:
        indices = idx_lib.calculate_or_load_indices(dataset, indexing, selection,
                                                    categories)
    else:
        indices = idx_lib.all_indices(dataset, indexing)

    loader = SliceBatchLoader(
        dataset, indices,
        batch_size=batch_size or data_config.batch_size,
        categories=tuple(dataset.categories()),
        shuffle=data_config.shuffle, seed=seed, transform=transform,
        indexing=indexing, num_workers=data_config.num_workers,
        shuffle_chunk=data_config.shuffle_chunk)
    return Data(dataset=dataset, loader=loader, nb_batches=len(loader))


def direct_subject_info(dataset, subject_index: int) -> dict:
    """Full labels volume + properties + files for one subject — replaces the
    reference's direct-extractor validation path (steps.py:98-114)."""
    subject = dataset.subjects[subject_index]
    return {
        "subject": subject,
        "labels": dataset.read_volume(subject, "labels"),
        "properties": dataset.properties(subject),
        "files": dataset.files(subject),
    }
