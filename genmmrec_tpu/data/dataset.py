"""Dataset ingestion: ``<ds>.inter`` TSV → numpy index arrays.

Capability parity with the reference ``RecDataset``
(`src/utils/dataset.py:21-141`): tab-separated interaction file with columns
``userID``/``itemID``/``x_label`` (optional ``rating``); ``n_users``/
``n_items`` are ``max id + 1``; ``split()`` partitions on ``x_label`` ∈
{0: train, 1: valid, 2: test} and optionally drops valid/test users unseen in
train (``filter_out_cod_start_users``).

TPU-native delta: the dataframe never leaves the host and is converted once
into flat ``int32`` numpy arrays; everything downstream
(`genmmrec_tpu/data/arrays.py`) is device-resident. When the dataset files are
absent and ``synthetic_fallback`` is enabled, a deterministic synthetic
dataset with the configured statistics is generated (the shipped reference
datasets are not redistributable).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from logging import getLogger
from typing import Optional

import numpy as np


@dataclass
class InterTable:
    """Flat interaction table (host, numpy)."""

    users: np.ndarray  # (n,) int32
    items: np.ndarray  # (n,) int32
    n_users: int
    n_items: int
    ratings: Optional[np.ndarray] = None  # (n,) float32 or None
    times: Optional[np.ndarray] = None  # (n,) float64 or None (TIME_FIELD)

    def __len__(self) -> int:
        return len(self.users)


class RecDataset:
    def __init__(self, config, table: Optional[InterTable] = None):
        self.config = config
        self.logger = getLogger()
        self.dataset_name = config["dataset"]
        self.uid_field = config["USER_ID_FIELD"]
        self.iid_field = config["ITEM_ID_FIELD"]
        self.splitting_label = config["inter_splitting_label"]

        if table is not None:
            self.table = table
            self.labels = None
            self.user_num = table.n_users
            self.item_num = table.n_items
            return

        self.dataset_path = os.path.abspath(
            os.path.join(config["data_path"] or "./data/", self.dataset_name)
        )
        inter_file = os.path.join(self.dataset_path, config["inter_file_name"] or "")
        if os.path.isfile(inter_file):
            self._load_inter(inter_file)
        elif config["synthetic_fallback"]:
            self.logger.warning(
                "Interaction file %s not found; generating deterministic "
                "synthetic dataset for %s.",
                inter_file,
                self.dataset_name,
            )
            self._generate_synthetic()
        else:
            raise ValueError(f"File {inter_file} not exist")

        self.user_num = int(self.table.users.max()) + 1 if len(self.table) else 0
        self.item_num = int(self.table.items.max()) + 1 if len(self.table) else 0
        self.table.n_users = self.user_num
        self.table.n_items = self.item_num

    # ------------------------------------------------------------------
    def _load_inter(self, inter_file: str) -> None:
        rating_field = self.config["RATING_FIELD"]
        # fast path: native C++ TSV parser (genmmrec_tpu/native)
        try:
            from genmmrec_tpu import native

            with open(inter_file, "r") as f:
                header = f.readline().rstrip("\n").split(
                    self.config["field_separator"] or "\t"
                )
            out = native.parse_inter_tsv(
                inter_file, header, self.uid_field, self.iid_field,
                self.splitting_label, rating_field,
            )
            if out is not None:
                users, items, labels, ratings = out
                self.table = InterTable(
                    users=users, items=items, n_users=0, n_items=0, ratings=ratings,
                    times=self._load_times(inter_file),
                )
                self.labels = labels
                return
        except Exception:
            self.logger.debug("native TSV parse unavailable; using pandas")

        import pandas as pd
        time_field = self.config["TIME_FIELD"]
        cols = [self.uid_field, self.iid_field, self.splitting_label]
        if rating_field:
            cols.append(rating_field)
        if time_field:
            cols.append(time_field)
        sep = self.config["field_separator"] or "\t"
        df = pd.read_csv(inter_file, usecols=lambda c: c in cols, sep=sep)
        missing = [
            c
            for c in (self.uid_field, self.iid_field, self.splitting_label)
            if c not in df.columns
        ]
        if missing:
            raise ValueError(
                f"File {inter_file} lost some required columns: {', '.join(missing)}."
            )
        self.table = InterTable(
            users=df[self.uid_field].to_numpy(np.int32),
            items=df[self.iid_field].to_numpy(np.int32),
            n_users=0,
            n_items=0,
            ratings=(
                df[rating_field].to_numpy(np.float32)
                if rating_field and rating_field in df.columns
                else None
            ),
            times=(
                df[time_field].to_numpy(np.float64)
                if time_field and time_field in df.columns
                else None
            ),
        )
        self.labels = df[self.splitting_label].to_numpy(np.int32)

    def _load_times(self, inter_file: str) -> Optional[np.ndarray]:
        """Single-column timestamp read (the native parser skips it)."""
        time_field = self.config["TIME_FIELD"]
        if not time_field:
            return None
        try:
            import pandas as pd

            sep = self.config["field_separator"] or "\t"
            df = pd.read_csv(inter_file, usecols=[time_field], sep=sep)
            return df[time_field].to_numpy(np.float64)
        except (ValueError, KeyError, OSError):
            return None

    # ------------------------------------------------------------------
    def _generate_synthetic(self) -> None:
        """Deterministic synthetic dataset matching configured statistics.

        Interactions follow a Zipf-like item popularity and log-normal user
        activity so that popularity-group / cold-start metric paths are
        exercised realistically. Split 80/10/10 per user (chronological
        surrogate), matching the reference's pre-split ``x_label`` scheme.
        """
        cfg = self.config
        n_users = int(cfg["synthetic_n_users"] or 1000)
        n_items = int(cfg["synthetic_n_items"] or 500)
        n_inters = int(cfg["synthetic_n_inters"] or 10000)
        import zlib

        # stable per-dataset seed (python's hash() is randomized per process)
        rng = np.random.default_rng(0xC0FFEE ^ zlib.crc32(self.dataset_name.encode()))

        # user activity ∝ lognormal, at least 3 interactions each; capped so
        # the padded history matrix (n_users x max_degree) stays bounded —
        # an uncapped lognormal tail at elec scale (192k users) produced a
        # multi-GB hist matrix and an HBM OOM
        act = rng.lognormal(0.0, 1.0, n_users)
        counts = np.maximum(3, (act / act.sum() * n_inters).astype(np.int64))
        counts = np.minimum(counts, min(n_items, 1000))
        # item popularity ∝ zipf
        pop = 1.0 / np.arange(1, n_items + 1) ** 0.8
        pop /= pop.sum()
        item_perm = rng.permutation(n_items)

        users_list, items_list, labels_list = [], [], []
        for u in range(n_users):
            c = int(min(counts[u], n_items))
            its = item_perm[
                rng.choice(n_items, size=c, replace=False, p=pop)
            ].astype(np.int32)
            users_list.append(np.full(c, u, np.int32))
            items_list.append(its)
            lab = np.zeros(c, np.int32)
            if c >= 3:
                lab[-1] = 2  # test
                lab[-2] = 1  # valid
            labels_list.append(lab)
        users = np.concatenate(users_list)
        items = np.concatenate(items_list)
        labels = np.concatenate(labels_list)
        # ensure every user/item id occurs at least once in train for id-range
        users[0], items[0] = 0, 0
        self.table = InterTable(users=users, items=items, n_users=n_users, n_items=n_items)
        # force full id ranges
        self.table.users = np.concatenate([users, np.array([n_users - 1], np.int32)])
        self.table.items = np.concatenate([items, np.array([n_items - 1], np.int32)])
        self.labels = np.concatenate([labels, np.array([0], np.int32)])
        # chronological surrogate: file order (per-user order is temporal)
        self.table.times = np.arange(len(self.table.users), dtype=np.float64)

    # ------------------------------------------------------------------
    def split(self):
        """Return (train, valid, test) RecDatasets split on x_label."""
        if self.labels is None:
            raise ValueError("split() called on an already-split dataset")
        parts = []
        for lab in range(3):
            m = self.labels == lab
            parts.append(
                InterTable(
                    users=self.table.users[m],
                    items=self.table.items[m],
                    n_users=self.user_num,
                    n_items=self.item_num,
                    ratings=(
                        self.table.ratings[m] if self.table.ratings is not None else None
                    ),
                    times=(
                        self.table.times[m] if self.table.times is not None else None
                    ),
                )
            )
        if self.config["filter_out_cod_start_users"]:
            train_users = np.zeros(self.user_num, bool)
            train_users[parts[0].users] = True
            for i in (1, 2):
                keep = train_users[parts[i].users]
                parts[i] = InterTable(
                    users=parts[i].users[keep],
                    items=parts[i].items[keep],
                    n_users=self.user_num,
                    n_items=self.item_num,
                    ratings=(
                        parts[i].ratings[keep] if parts[i].ratings is not None else None
                    ),
                    times=(
                        parts[i].times[keep] if parts[i].times is not None else None
                    ),
                )
        return [self.copy(p) for p in parts]

    def copy(self, table: InterTable) -> "RecDataset":
        nxt = RecDataset(self.config, table)
        nxt.user_num = self.user_num
        nxt.item_num = self.item_num
        return nxt

    # -- reference-compatible accessors --------------------------------
    def get_user_num(self) -> int:
        return self.user_num

    def get_item_num(self) -> int:
        return self.item_num

    def __len__(self) -> int:
        return len(self.table)

    def __str__(self) -> str:
        inter_num = len(self.table)
        uni_u = len(np.unique(self.table.users))
        uni_i = len(np.unique(self.table.items))
        info = [str(self.dataset_name)]
        if uni_u:
            info.append(f"The number of users: {uni_u}")
            info.append(f"Average actions of users: {inter_num / uni_u}")
        if uni_i:
            info.append(f"The number of items: {uni_i}")
            info.append(f"Average actions of items: {inter_num / uni_i}")
        info.append(f"The number of inters: {inter_num}")
        if uni_u and uni_i:
            sparsity = 1 - inter_num / uni_u / uni_i
            info.append(f"The sparsity of the dataset: {sparsity * 100}%")
        return "\n".join(info)

    __repr__ = __str__
