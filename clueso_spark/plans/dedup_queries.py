"""placeholder -- populated this round"""
