"""CLI tools: tpp-gen, tpp-opt, tpp-run, tpp-fpcmp, tpp-bench."""
