"""Index-interactive refinement: variant calling and gap filling."""
