"""Post-processing: VTU export, boundary-condition export."""
