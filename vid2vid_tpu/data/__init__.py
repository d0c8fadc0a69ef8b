"""Host-side dataset pipelines (temporal / face / pose / test / synthetic)."""
