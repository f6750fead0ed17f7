"""TODO: operators pending."""
