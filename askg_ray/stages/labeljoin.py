"""Label attachment + key semi-joins without driver-side materialization.

After connected components, every dedup family must tag corpus rows
with their component label. Round 1 collected the (node → component)
map into a Python dict and ``ray.put``-broadcast it — fine while label
sets are provably small, but label volume grows with duplicate density
× corpus size, so at 100 TB that dict is a driver OOM.

``attach_labels`` keeps labels as a Dataset and picks the physical
plan by measured size:

  * labels < ``broadcast_threshold``  → broadcast dict (cheap, one map
    pass over ``ds``, no shuffle) — the sanctioned small-side pattern;
  * otherwise → a partitioned join expressed as union + one
    ``groupby(key)`` shuffle: label rows are padded to ``ds``'s schema
    (all-null except the key) and ride the same shuffle, so each group
    holds the data rows plus at most one label row. No driver state at
    any size.

``semi_join_keys`` filters a pair table to rows whose column value
appears in a key Dataset, with the same broadcast-vs-shuffle policy.

Both distributed paths are exercised directly in tests (threshold=0),
mirroring how stages/components.py tests its hash-to-min path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

BROADCAST_LABELS_MAX = 500_000


def _arrow_schema(ds) -> pa.Schema:
    sch = ds.schema()
    return getattr(sch, "base_schema", sch)


def attach_labels(ds, labels, key: str, make_default,
                  broadcast_threshold: int = BROADCAST_LABELS_MAX,
                  comp_type: pa.DataType | None = None):
    """ds + ``comp`` column = component label, or ``make_default(key)``.

    ds: Dataset whose ``key`` column matches labels' ``node`` dtype and
    is unique per row (entity/doc ids). labels: Dataset[(node,
    component)]. ds must be cheap to re-consume (materialized or a map
    off one); labels is compacted here (it is counted + consumed).
    ``comp_type`` overrides schema inference (needed when labels may be
    empty and its lazy schema unavailable).
    """
    from ..rayutil import compact

    labels = compact(labels)
    n = labels.count()
    if comp_type is None:
        comp_type = _arrow_schema(labels).field("component").type

    if n == 0:
        def default_only(batch: pa.Table) -> pa.Table:
            vals = [make_default(v) for v in batch[key].to_pylist()]
            return batch.append_column("comp", pa.array(vals, comp_type))

        return ds.map_batches(default_only, batch_format="pyarrow")

    if n < broadcast_threshold:
        import ray

        label_map: dict = {}
        for b in labels.iter_batches(batch_format="pyarrow"):
            label_map.update(zip(b["node"].to_pylist(),
                                 b["component"].to_pylist()))
        ref = ray.put(label_map)

        def tag(batch: pa.Table) -> pa.Table:
            m = ray.get(ref)
            vals = [m.get(v, make_default(v)) for v in batch[key].to_pylist()]
            return batch.append_column("comp", pa.array(vals, comp_type))

        return ds.map_batches(tag, batch_format="pyarrow")

    # -- distributed path: pad label rows to ds's schema, one shuffle --
    ds_schema = _arrow_schema(ds)
    out_schema = (ds_schema
                  .append(pa.field("comp", comp_type))
                  .append(pa.field("__lab", pa.bool_())))
    key_type = ds_schema.field(key).type

    def pad_labels(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        arrays = []
        for f in ds_schema:
            if f.name == key:
                arrays.append(batch["node"].cast(key_type))
            else:
                arrays.append(pa.nulls(n_rows, f.type))
        arrays.append(batch["component"].cast(comp_type))
        arrays.append(pa.array([True] * n_rows, pa.bool_()))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    def pad_ds(batch: pa.Table) -> pa.Table:
        t = batch.append_column("comp", pa.nulls(batch.num_rows, comp_type))
        return t.append_column("__lab",
                               pa.array([False] * batch.num_rows, pa.bool_()))

    def resolve(group: pa.Table) -> pa.Table:
        lab_mask = group["__lab"].to_pylist()
        comp = None
        for i, is_lab in enumerate(lab_mask):
            if is_lab:
                comp = group["comp"][i].as_py()
                break
        data = group.filter(pa.array([not x for x in lab_mask]))
        if data.num_rows == 0:
            return out_schema.remove(len(out_schema) - 1).empty_table()
        if comp is None:
            comp = make_default(data[key][0].as_py())
        t = data.drop_columns(["comp", "__lab"])
        return t.append_column("comp",
                               pa.array([comp] * t.num_rows, comp_type))

    padded = (ds.map_batches(pad_ds, batch_format="pyarrow")
              .union(labels.map_batches(pad_labels, batch_format="pyarrow")))
    return padded.groupby(key).map_groups(resolve, batch_format="pyarrow")


def attach_dim(facts, dim, fact_key: str, dim_key: str,
               value_cols: list[str],
               broadcast_threshold: int = BROADCAST_LABELS_MAX):
    """Fact ⋈ dimension attach with the same size-gated policy as
    ``attach_labels``: a dimension under ``broadcast_threshold`` rows is
    broadcast once via ``ray.put`` (sorted-key ``searchsorted`` lookup —
    fully vectorized, no per-row dict probes on the fact table's hot
    path); a larger one rides a partitioned join (dim rows padded to the
    fact schema + one ``groupby(fact_key)`` shuffle — no driver state at
    any size). Unmatched fact keys get null values. ``dim`` is compacted
    here; ``facts`` stays a lazy stream.
    """
    import numpy as np

    from ..rayutil import compact

    dim = compact(dim)
    n = dim.count()
    dim_schema = _arrow_schema(dim)
    if dim_schema is None:
        # SCHEMA-LESS empty dim (e.g. a groupby over an empty corpus):
        # nothing to attach and no types to null-fill with — hand the
        # facts through untouched; downstream kernels guard missing
        # columns by repo convention (better than the AttributeError
        # this used to raise on empty partitions)
        return facts
    val_types = {c: dim_schema.field(c).type for c in value_cols}

    if n < broadcast_threshold:
        import ray

        parts = [b for b in dim.iter_batches(batch_format="pyarrow")]
        dtbl = pa.concat_tables(parts).combine_chunks()
        order = pc.sort_indices(dtbl[dim_key])
        dtbl = dtbl.take(order).combine_chunks()
        keys_np = dtbl[dim_key].to_numpy(zero_copy_only=False)
        ref = ray.put((keys_np, dtbl.select(value_cols)))

        def lookup(batch: pa.Table) -> pa.Table:
            keys_sorted, vals = ray.get(ref)
            fk = batch[fact_key].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(keys_sorted, fk)
            idx_c = np.clip(idx, 0, len(keys_sorted) - 1)
            hit = keys_sorted[idx_c] == fk
            take = pa.array(np.where(hit, idx_c, -1), pa.int64())
            # -1 → null via a masked take
            take = pc.if_else(pc.equal(take, -1),
                              pa.nulls(batch.num_rows, pa.int64()), take)
            for c in value_cols:
                batch = batch.append_column(c, vals[c].take(take))
            return batch

        return facts.map_batches(lookup, batch_format="pyarrow")

    # -- distributed: dim rows padded to fact schema, one shuffle ----------
    fact_schema = _arrow_schema(facts)
    out_schema = fact_schema
    for c in value_cols:
        out_schema = out_schema.append(pa.field(c, val_types[c]))
    padded_schema = out_schema.append(pa.field("__dim", pa.bool_()))
    key_type = fact_schema.field(fact_key).type

    def pad_dim(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        arrays = []
        for f in fact_schema:
            if f.name == fact_key:
                arrays.append(batch[dim_key].cast(key_type))
            else:
                arrays.append(pa.nulls(n_rows, f.type))
        for c in value_cols:
            arrays.append(batch[c])
        arrays.append(pa.array([True] * n_rows, pa.bool_()))
        return pa.Table.from_arrays(arrays, schema=padded_schema)

    def pad_facts(batch: pa.Table) -> pa.Table:
        for c in value_cols:
            batch = batch.append_column(c, pa.nulls(batch.num_rows,
                                                    val_types[c]))
        return batch.append_column(
            "__dim", pa.array([False] * batch.num_rows, pa.bool_()))

    def resolve(group: pa.Table) -> pa.Table:
        marks = group["__dim"].to_numpy(zero_copy_only=False)
        data = group.filter(pa.array(~marks))
        if data.num_rows == 0:
            return out_schema.empty_table()
        dim_rows = group.filter(pa.array(marks))
        t = data.drop_columns(value_cols + ["__dim"])
        for c in value_cols:
            if dim_rows.num_rows:
                col = pa.repeat(dim_rows[c][0].cast(val_types[c]), t.num_rows)
            else:
                col = pa.nulls(t.num_rows, val_types[c])
            t = t.append_column(c, col)
        return t

    padded = (facts.map_batches(pad_facts, batch_format="pyarrow")
              .union(dim.map_batches(pad_dim, batch_format="pyarrow")))
    return (padded.groupby(fact_key)
            .map_groups(resolve, batch_format="pyarrow"))


def semi_join_keys(pairs, keys_ds, col: str,
                   broadcast_threshold: int = BROADCAST_LABELS_MAX):
    """Keep pair rows whose ``col`` value appears in keys_ds's first
    column. keys_ds is compacted here; pairs must be re-consumable."""
    from ..rayutil import compact

    keys_ds = compact(keys_ds)
    n = keys_ds.count()
    pair_schema = _arrow_schema(pairs)
    if pair_schema is None:     # schema-less empty pairs: nothing kept
        return pairs
    if n == 0:
        import ray.data as rd
        return rd.from_arrow(pair_schema.empty_table())
    key_col = _arrow_schema(keys_ds).names[0]

    if n < broadcast_threshold:
        import ray

        import pyarrow.compute as pc

        chunks = [b[key_col].combine_chunks()
                  for b in keys_ds.iter_batches(batch_format="pyarrow")
                  if b.num_rows]
        keep_arr = pc.unique(pa.chunked_array(chunks).combine_chunks())
        ref = ray.put(keep_arr)

        def filt(batch: pa.Table) -> pa.Table:
            # vectorized membership test (was a per-row Python set probe)
            vs = ray.get(ref)
            return batch.filter(pc.is_in(batch[col], value_set=vs))

        return pairs.map_batches(filt, batch_format="pyarrow")

    # -- distributed: marker rows ride the same shuffle ----------------
    out_schema = pair_schema.append(pa.field("__key", pa.bool_()))

    def pad_pairs(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__key", pa.array([False] * batch.num_rows, pa.bool_()))

    def pad_keys(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        arrays = []
        for f in pair_schema:
            if f.name == col:
                arrays.append(batch[key_col].cast(f.type))
            else:
                arrays.append(pa.nulls(n_rows, f.type))
        arrays.append(pa.array([True] * n_rows, pa.bool_()))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    def resolve(group: pa.Table) -> pa.Table:
        marks = group["__key"].to_pylist()
        if not any(marks):
            return pair_schema.empty_table()
        data = group.filter(pa.array([not x for x in marks]))
        return data.drop_columns(["__key"])

    padded = (pairs.map_batches(pad_pairs, batch_format="pyarrow")
              .union(keys_ds.map_batches(pad_keys, batch_format="pyarrow")))
    return (padded.groupby(col)
            .map_groups(resolve, batch_format="pyarrow"))
