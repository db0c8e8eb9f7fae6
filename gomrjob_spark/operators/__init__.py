"""Engine operators beyond Spark builtins: dedup, similarity search, text
analysis, multimodal columns, as-of joins. Each module documents its 100 TB
execution strategy (partitioning, shuffle counts, skew handling)."""
