import { Entity, PrimaryGeneratedColumn, Column } from 'typeorm';

// The @Entity name is the ONLY place the physical table lives for
// repository-scoped query builders — the r15 emitter resolves it from
// here (found-or-loud: a repo without this declaration refuses).
@Entity('expenses')
export class Expense {
  @PrimaryGeneratedColumn()
  id: number;

  @Column('float')
  amount: number;

  @Column({ nullable: true })
  category: string;

  @Column('date')
  date: string;
}
