from django.db import models


class Expense(models.Model):
    amount = models.FloatField()
    category = models.CharField(max_length=64, null=True)
    date = models.DateField()
