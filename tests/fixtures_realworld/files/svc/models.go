package svc

import (
	"time"
)

// grouped type block — the idiomatic way a go file declares its model
// set; entries are structs, interfaces, defined types and aliases.
type (
	Task struct {
		ID      int
		Title   string
		Due     time.Time
		history []Event
	}

	Event struct {
		At   time.Time
		Kind string
	}

	Clock interface {
		Now() time.Time
	}

	Priority int

	TaskID = int
)

// grouped const block: its opener must not mint a phantom call (wave 5)
const (
	StateOpen = iota
	StateDone
)

// single-line defined types outside the block
type Duration time.Duration

type Middleware func(next Handler) Handler

func (t *Task) Overdue(c Clock) bool {
	return t.Due.Before(c.Now())
}

func NewTask(id int, title string) *Task {
	return &Task{ID: id, Title: title}
}
