"""Named query plans: the deal-pipeline views and the driver-facing catalog."""
