// React-style hooks module: typed arrow declarators (return-type
// annotation before `=>`), a TS namespace, and an ambient declaration —
// the round-5 wave-4 shapes.
import { useState, useEffect } from 'react'
import type { Task } from './model'

export interface PollOptions {
  intervalMs: number
  retries?: number
}

export const useTasks = (): Task[] => {
  const [tasks, setTasks] = useState([])
  useEffect(() => {
    fetchTasks().then(setTasks)
  }, [])
  return tasks
}

export const usePoll = (opts: PollOptions): void => {
  schedule(opts.intervalMs)
}

// legacy internal namespace kept for the v1 API surface
namespace Compat {
  export const VERSION = '1.0'
  export function wrap(t: Task): Task {
    return migrate(t)
  }
}

declare function reportMetric(name: string, value: number): void

const fetchTasks = async (): Promise<Task[]> => {
  const res = await fetch('/api/tasks')
  return res.json()
}

// generic arrow declarator — the trailing-comma TSX-safe form (wave 8)
export const firstOr = <T,>(xs: T[], fallback: T): T => {
  return xs.length > 0 ? xs[0] : fallback
}
