"""Structured Streaming runtime over the transcripts table.

The reference processes data as whole-table batch hops with step files
(/root/reference/dataflow/utils/storage.py:95-107) and micro-batches via
BatchWrapper (wrapper/batch_wrapper.py:42-98). This runtime is the
streaming generalization the north rule mandates: watermarked tumbling /
sliding / session windows keyed by conv_id, stateful conversation assembly
(applyInPandasWithState), a stream-stream user↔assistant join, and an
exactly-once keyed MERGE sink with per-batch, per-partition lineage.
"""
