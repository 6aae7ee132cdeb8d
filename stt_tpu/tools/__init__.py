# Tooling surface mirroring the reference's bin/ scripts and aux modules.
