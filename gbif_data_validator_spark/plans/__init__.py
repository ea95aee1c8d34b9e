"""Plans: driver-side orchestration — preflight, the staged validation
engine, checkpoint/resume (the reference's job-server + master-actor layer
re-expressed as deterministic driver logic over lazy DataFrames)."""
